"""pianobart_tpu: a TPU-native (JAX/XLA/Pallas) framework for symbolic piano
music pretraining, understanding, and generation.

Re-designed from scratch with the capabilities of RS2002/PianoBart
(BART-style denoising pretraining over 8-field "Octuple" MIDI token streams,
four understanding finetunes, MIDI continuation generation, model merging,
and serving) — built TPU-first: fused XLA/Pallas compute, pjit/mesh
parallelism, KV-cached scanned decode, on-device data corruption.
"""

__version__ = "0.1.0"

from . import vocab  # noqa: E402  (lightweight, no jax import)

__all__ = ["vocab"]


def __getattr__(name):
    # Lazy heavyweight imports: `import pianobart_tpu` stays cheap.
    import importlib
    lazy = {
        "models": ".models", "ops": ".ops", "train": ".train",
        "parallel": ".parallel", "data": ".data", "merge": ".merge",
        "tokenizer": ".tokenizer", "midi": ".midi", "decode": ".decode",
        "serve": ".serve", "compat": ".compat", "utils": ".utils",
    }
    if name in lazy:
        return importlib.import_module(lazy[name], __name__)
    raise AttributeError(name)
