"""Decompose the pretrain step time on TPU (CSE-proof, RTT-corrected).

Every scanned body depends on the carry, so XLA cannot hoist it; a no-op
dispatch measures the tunnel round trip, subtracted from all numbers.

  rtt       — empty jitted dispatch + value fetch
  attn24[pbx|jax] — 24 chained flash fwd (one per model attention module)
  attnbwd24 — 24 chained flash fwd+bwd
  fwd       — full model forward+loss, input perturbed by carry
  fwdbwd    — full model value_and_grad, grads folded into scalar carry
  adam      — optimizer update only, chained on params
Usage: python scripts/perf_probe.py [probe ...]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(which):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from flax import linen as nn
    from pianobart_tpu import vocab as V
    from pianobart_tpu.models import PianoBartConfig, PianoBartLM
    from pianobart_tpu.train.pretrain import _forward_loss
    from pianobart_tpu.train.state import TrainState, make_optimizer
    from pianobart_tpu.ops.noise import corrupt_batch

    B, S, H, D = 32, 1024, 8, 128
    cfg = PianoBartConfig(dtype=jnp.bfloat16)
    model = PianoBartLM(cfg)
    rng = jax.random.PRNGKey(0)

    def measure(fn, *args, reps=4):
        out = fn(*args)                       # compile + warm
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / reps

    @jax.jit
    def noop(x):
        return x + 1.0
    rtt = measure(noop, jnp.float32(0), reps=8)
    print(f"rtt        {rtt * 1e3:8.2f} ms", flush=True)

    if "attn" in which:
        from pianobart_tpu.ops.flash import flash_attention
        q = jax.random.normal(rng, (B, S, H, D), jnp.bfloat16) * 0.1
        mask = jnp.ones((B, S))

        @jax.jit
        def attn24(x):
            def body(c, _):
                o = flash_attention(c, c, c, mask, False)
                return (o * 0.5 + c * 0.5).astype(c.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=24)
            return y.astype(jnp.float32).sum()   # scalar fetch: tunnel-honest
        t = measure(attn24, q) - rtt
        print(f"attn24 pbx {t * 1e3:8.2f} ms ({t / 24 * 1e3:.2f} ms/module)",
              flush=True)

        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash)

        @jax.jit
        def attn24_jax(x):
            def body(c, _):
                ct = c.transpose(0, 2, 1, 3)
                o = jax_flash(ct, ct, ct, causal=False, sm_scale=1.0)
                o = o.transpose(0, 2, 1, 3)
                return (o * 0.5 + c * 0.5).astype(c.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=24)
            return y.astype(jnp.float32).sum()
        t = measure(attn24_jax, q) - rtt
        print(f"attn24 jax {t * 1e3:8.2f} ms ({t / 24 * 1e3:.2f} ms/module)",
              flush=True)

        @jax.jit
        def attnbwd24(x):
            def body(c, _):
                def loss(z):
                    o = flash_attention(z, z, z, mask, False)
                    return (o.astype(jnp.float32) * z.astype(jnp.float32)
                            ).sum()
                g = jax.grad(loss)(c)
                return (c * 0.5 + g * 0.5).astype(c.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=24)
            return y.astype(jnp.float32).sum()
        t = measure(attnbwd24, q) - rtt
        print(f"attnbwd24  {t * 1e3:8.2f} ms ({t / 24 * 1e3:.2f} ms/module)",
              flush=True)

    # --- model-level ---
    ids0 = jnp.zeros((B, S, 8), jnp.int32)
    m0 = jnp.ones((B, S))
    variables = nn.meta.unbox(model.init(rng, ids0, ids0, m0, m0))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_optimizer())
    npr = np.random.default_rng(0)
    batch = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        batch[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    batch = jnp.asarray(batch)
    rngc, _ = jax.random.split(rng)
    corrupted, loss_mask = jax.jit(corrupt_batch, static_argnums=2)(
        rngc, batch, 0.15)

    K = 5
    if "fwd" in which:
        @jax.jit
        def fwd(params, corrupted, lm):
            def body(c, _):
                # perturb one input element by the carry: no CSE hoisting
                cor = corrupted.at[0, 0, 0].set(
                    (c.astype(jnp.int32) % 2))
                total, _ = _forward_loss(params, model.apply, batch, cor,
                                         lm, cfg, None, True)
                return c + total, None
            y, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return y
        t = (measure(fwd, state.params, corrupted, loss_mask) - rtt) / K
        print(f"fwd+loss   {t * 1e3:8.2f} ms", flush=True)

    if "fwdbwd" in which:
        @jax.jit
        def fwdbwd(params, corrupted, lm):
            def body(c, _):
                cor = corrupted.at[0, 0, 0].set((c.astype(jnp.int32) % 2))
                g = jax.grad(
                    lambda p: _forward_loss(p, model.apply, batch, cor,
                                            lm, cfg, None, True)[0])(params)
                s = sum(x.astype(jnp.float32).sum()
                        for x in jax.tree.leaves(g))
                return c + s, None
            y, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return y
        t = (measure(fwdbwd, state.params, corrupted, loss_mask) - rtt) / K
        print(f"fwd+bwd    {t * 1e3:8.2f} ms", flush=True)

    if "adam" in which:
        grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6, state.params)

        @jax.jit
        def adam(state):
            def body(s, _):
                return s.apply_gradients(grads=grads), None
            s, _ = jax.lax.scan(body, state, None, length=K)
            return s.params
        t = (measure(adam, state) - rtt) / K
        print(f"adam       {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["attn", "fwd", "fwdbwd", "adam"]
    main(which)
