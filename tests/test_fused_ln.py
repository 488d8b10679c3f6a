"""Fused dropout+residual+LayerNorm kernel (ops/fused_ln.py), CPU interpret
mode (host-bits PRNG substitute — `prng_seed` has no CPU lowering; the
in-kernel PRNG path is exercised on TPU by scripts/step_lab.py and bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu.ops.fused_ln import (_host_bits, _keep_scale, _threshold,
                                        dropout_add_ln, fused_eligible)

B, S, D = 2, 128, 256
RATE = 0.1
EPS = 1e-5


def _setup(dtype=jnp.float32):
    h = jax.random.normal(jax.random.PRNGKey(0), (B, S, D)).astype(dtype)
    res = jax.random.normal(jax.random.PRNGKey(1), (B, S, D)).astype(dtype)
    gamma = jnp.linspace(0.5, 1.5, D, dtype=jnp.float32)
    beta = jnp.linspace(-0.2, 0.2, D, dtype=jnp.float32)
    return h, res, gamma, beta, jnp.uint32(7)


def _replica_fn(seed, rate):
    bits = _host_bits(seed, B * S, D).reshape(B, S, D)
    keep = bits >= jnp.uint32(_threshold(rate))
    ks = _keep_scale(rate)

    def replica(h, res, gamma, beta):
        y = (res.astype(jnp.float32)
             + jnp.where(keep, h.astype(jnp.float32) * ks, 0.0))
        mean = y.mean(-1, keepdims=True)
        var = (y * y).mean(-1, keepdims=True) - mean ** 2
        return ((y - mean) * jax.lax.rsqrt(var + EPS) * gamma
                + beta).astype(h.dtype)
    return replica


def test_forward_matches_replica():
    h, res, gamma, beta, seed = _setup()
    out = dropout_add_ln(h, res, gamma, beta, seed, RATE)
    ref = _replica_fn(seed, RATE)(h, res, gamma, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_near_constant_large_rows_stay_finite():
    # f32 cancellation makes E[y^2]-mean^2 negative for large near-constant
    # rows; without the max(0, var) clamp (flax convention, round-3 review
    # finding) rsqrt returns NaN.
    rng = np.random.default_rng(66)
    res = (1e5 + rng.normal(0, 0.1, (B, S, D))).astype(np.float32)
    # self-check: these rows really do drive the unclamped f32 variance
    # below -eps (the bug being pinned), at least for some rows
    y = jnp.asarray(res)
    mean = y.mean(-1, keepdims=True)
    raw_var = (y * y).mean(-1, keepdims=True) - mean * mean
    assert float(raw_var.min()) < -EPS, "inputs no longer trigger the bug"
    h = jnp.zeros((B, S, D), jnp.float32)
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)
    out = dropout_add_ln(h, jnp.asarray(res), gamma, beta, jnp.uint32(3), 0.0)
    assert np.isfinite(np.asarray(out)).all()


def test_rate_zero_is_plain_add_ln():
    h, res, gamma, beta, seed = _setup()
    out = dropout_add_ln(h, res, gamma, beta, seed, 0.0)
    y = (h + res).astype(jnp.float32)
    mean = y.mean(-1, keepdims=True)
    var = (y * y).mean(-1, keepdims=True) - mean ** 2
    ref = (y - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_replica():
    h, res, gamma, beta, seed = _setup()
    replica = _replica_fn(seed, RATE)

    def loss_f(*a):
        return (dropout_add_ln(*a, seed, RATE).astype(jnp.float32) ** 2).sum()

    def loss_r(*a):
        return (replica(*a).astype(jnp.float32) ** 2).sum()

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(h, res, gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(h, res, gamma, beta)
    for name, a, b in zip(("dh", "dres", "dgamma", "dbeta"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_bf16_inputs():
    h, res, gamma, beta, seed = _setup(jnp.bfloat16)
    out = dropout_add_ln(h, res, gamma, beta, seed, RATE)
    assert out.dtype == jnp.bfloat16
    ref = _replica_fn(seed, RATE)(h, res, gamma, beta)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_unbiased_scaling():
    """E[dropout(h)] == h with the quantized keep-scale: column means over a
    large batch stay near the deterministic path."""
    n = 512 * 128
    h = jnp.ones((n, 128), jnp.float32)
    res = jnp.zeros((n, 128), jnp.float32)
    gamma = jnp.ones(128)
    beta = jnp.zeros(128)
    # rate=0.5: heavy quantization case; LN normalizes rows, so instead of
    # the LN output check the mask statistics through the VJP: dres of
    # sum(out) integrates the mask-scaled path.  Simpler: mask mean.
    bits = _host_bits(jnp.uint32(3), n, 128)
    keep = bits >= jnp.uint32(_threshold(0.5))
    ks = _keep_scale(0.5)
    m = float((jnp.where(keep, ks, 0.0)).mean())
    assert abs(m - 1.0) < 5e-3


def test_eligibility():
    assert fused_eligible((32, 1024, 1024))
    assert not fused_eligible((32, 1024, 1000))   # lane-misaligned D
    assert not fused_eligible((1, 100, 1024))     # row count not 128-divisible
