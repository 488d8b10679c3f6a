"""pianobart_tpu: a TPU-native (JAX/XLA/Pallas) framework for symbolic piano
music pretraining, understanding, and generation.

Re-designed from scratch with the capabilities of RS2002/PianoBart
(BART-style denoising pretraining over 8-field "Octuple" MIDI token streams,
four understanding finetunes, MIDI continuation generation, model merging,
and serving) — built TPU-first: fused XLA/Pallas compute, pjit/mesh
parallelism, KV-cached scanned decode, on-device data corruption.
"""

__version__ = "0.1.0"
