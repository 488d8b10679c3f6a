"""TPU perf sweep for the full pretrain step.

Times pretrain_multi_step under several (batch, dropout, remat) variants on
the attached chip, one process (the chip is single-tenant), printing one
line per variant.  Compiles are cached in .jax_cache, so re-runs are cheap.

Usage: python scripts/perf_sweep.py [variant ...]
  default variants: b32 b32_nodrop b64 b64_remat
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

VARIANTS = {
    "b16":        dict(B=16),
    "b32":        dict(B=32),
    "b32_nodrop": dict(B=32, dropout=0.0),
    "b32_remat":  dict(B=32, remat=True),
    "b48":        dict(B=48),
    "b64":        dict(B=64),
    "b64_nodrop": dict(B=64, dropout=0.0),
    "b64_remat":  dict(B=64, remat=True),
    "b128_remat": dict(B=128, remat=True),
}


def main(names):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from flax import linen as nn
    from pianobart_tpu import vocab as V
    from pianobart_tpu.models import PianoBartConfig, PianoBartLM
    from pianobart_tpu.train.pretrain import pretrain_multi_step
    from pianobart_tpu.train.state import TrainState, make_optimizer

    K = 10
    for name in names:
        spec = dict(VARIANTS[name])
        B = spec.pop("B")
        cfg = PianoBartConfig(dtype=jnp.bfloat16, **spec)
        model = PianoBartLM(cfg)
        S = cfg.max_len
        rng = jax.random.PRNGKey(0)
        ids0 = jnp.zeros((B, S, 8), jnp.int32)
        m0 = jnp.ones((B, S))
        try:
            variables = nn.meta.unbox(model.init(rng, ids0, ids0, m0, m0))
            state = TrainState.create(apply_fn=model.apply,
                                      params=variables["params"],
                                      tx=make_optimizer())
            npr = np.random.default_rng(0)
            batch = np.zeros((B, S, 8), dtype=np.int32)
            for f in range(8):
                batch[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
            batch = jnp.asarray(batch)

            t0 = time.perf_counter()
            state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg,
                                                     0.15, K)
            _ = float(losses[-1])
            compile_s = time.perf_counter() - t0

            reps = 2
            t0 = time.perf_counter()
            for _ in range(reps):
                state, (losses, *_) = pretrain_multi_step(state, batch, rng,
                                                         cfg, 0.15, K)
                _ = float(losses[-1])
            dt = time.perf_counter() - t0
            steps = reps * K
            print(f"{name:12s} B={B:3d} step={dt / steps * 1e3:7.1f} ms  "
                  f"tok/s={steps * B * S / dt:9.0f}  "
                  f"(compile {compile_s:.0f}s)", flush=True)
            del state, variables
        except Exception as exc:
            print(f"{name:12s} B={B:3d} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["b32", "b32_nodrop", "b64", "b64_remat"]
    main(names)
