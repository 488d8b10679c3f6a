"""TPU correctness check for the in-kernel-PRNG fused dropout+add+LN path.

CPU tests (tests/test_fused_ln.py) exercise the math with host bits; this
verifies the REAL path (pltpu.prng_seed / prng_random_bits + the backward's
bit regeneration) on the chip:

1. determinism: same seed -> bit-identical output;
2. mask recovery: y = xhat/rstd + mean, mask = (y - res) / (h*ks) must be
   exactly {0, 1} — proves the kernel computes LN(res + mask*h*ks);
3. gradient parity: jax.grad through the fused op == autodiff of a pure-JAX
   replica built with the RECOVERED mask — proves the backward regenerates
   the forward's exact bits.

Usage: python scripts/fused_ln_tpu_check.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from pianobart_tpu.ops.fused_ln import (_fwd_call, _keep_scale,
                                            dropout_add_ln)

    assert jax.default_backend() == "tpu", jax.default_backend()
    B, S, D = 4, 512, 1024
    rate = 0.1
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    h = jax.random.normal(k1, (B, S, D), jnp.float32) + 0.3
    h = jnp.where(jnp.abs(h) < 0.05, 0.11, h)     # keep h nonzero everywhere
    res = jax.random.normal(k2, (B, S, D), jnp.float32)
    gamma = jnp.linspace(0.5, 1.5, D)
    beta = jnp.linspace(-0.2, 0.2, D)
    seed = jnp.uint32(1234)

    out1 = np.asarray(dropout_add_ln(h, res, gamma, beta, seed, rate))
    out2 = np.asarray(dropout_add_ln(h, res, gamma, beta, seed, rate))
    assert (out1 == out2).all(), "same seed must be deterministic"
    out3 = np.asarray(dropout_add_ln(h, res, gamma, beta, jnp.uint32(99),
                                     rate))
    assert not (out1 == out3).all(), "different seed must differ"
    print("determinism OK")

    # recover the mask from the forward internals
    h2 = h.reshape(-1, D)
    res2 = res.reshape(-1, D)
    out, mean, rstd = _fwd_call(h2, res2, gamma, beta, seed, rate, 1e-5)
    n = h2.shape[0]
    r = mean.shape[1]
    mean = np.asarray(mean).reshape(-1)[:, None]
    rstd = np.asarray(rstd).reshape(-1)[:, None]
    xhat = (np.asarray(out, np.float64) - np.asarray(beta)) / np.asarray(gamma)
    y = xhat / rstd + mean
    ks = _keep_scale(rate)
    mask_f = (y - np.asarray(res2, np.float64)) / (np.asarray(h2, np.float64)
                                                   * ks)
    mask = np.round(mask_f)
    assert set(np.unique(mask)) <= {0.0, 1.0}, np.unique(mask)[:10]
    err = np.abs(mask_f - mask).max()
    keep_rate = mask.mean()
    print(f"mask recovery OK (max residual {err:.2e}, keep {keep_rate:.4f} "
          f"vs nominal {1 - rate})")
    assert err < 1e-2
    assert abs(keep_rate - (1 - rate)) < 5e-3

    keep = jnp.asarray(mask.reshape(B, S, D) > 0.5)

    def replica(h_, res_, g_, b_):
        yy = res_.astype(jnp.float32) + jnp.where(
            keep, h_.astype(jnp.float32) * ks, 0.0)
        mu = yy.mean(-1, keepdims=True)
        var = (yy * yy).mean(-1, keepdims=True) - mu ** 2
        return (yy - mu) * jax.lax.rsqrt(var + 1e-5) * g_ + b_

    def loss_f(*a):
        return (dropout_add_ln(*a, seed, rate).astype(jnp.float32) ** 2).sum()

    def loss_r(*a):
        return (replica(*a).astype(jnp.float32) ** 2).sum()

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(h, res, gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(h, res, gamma, beta)
    for name, a, b in zip(("dh", "dres", "dgamma", "dbeta"), gf, gr):
        d = float(jnp.max(jnp.abs(a - b)))
        rel = d / (float(jnp.max(jnp.abs(b))) + 1e-12)
        print(f"{name}: max|diff| {d:.3e} (rel {rel:.2e})")
        assert rel < 5e-4, (name, d, rel)
    print("TPU fused_ln gradient parity OK")


if __name__ == "__main__":
    main()
