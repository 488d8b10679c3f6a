"""Ring attention prototype: matches full attention on a virtual sp mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu.ops.attention import _xla_attention
from pianobart_tpu.ops.ring import ring_attention_sharded
from pianobart_tpu.parallel.mesh import make_mesh

B, S, H, D = 2, 256, 2, 128


def setup(seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, S, H, D)) * 0.3
    k = jax.random.normal(k2, (B, S, H, D)) * 0.3
    v = jax.random.normal(k3, (B, S, H, D))
    mask = jnp.ones((B, S)).at[1, S - 30:].set(0.0)
    return q, k, v, mask


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(causal):
    q, k, v, mask = setup()
    mesh = make_mesh(dp=1, tp=1, sp=4, devices=jax.devices()[:4])
    out = ring_attention_sharded(q, k, v, mask, causal=causal, mesh=mesh)
    expect = _xla_attention(q, k, v, mask, causal, None, 0.0, True, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=3e-5, atol=3e-5)


def test_ring_no_mask():
    q, k, v, _ = setup(seed=1)
    mesh = make_mesh(dp=1, tp=1, sp=4, devices=jax.devices()[:4])
    out = ring_attention_sharded(q, k, v, None, causal=False, mesh=mesh)
    expect = _xla_attention(q, k, v, None, False, None, 0.0, True, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_gradients_match_full(causal):
    """Ring backward (rotating dK/dV accumulators) == full-attention grads."""
    q, k, v, mask = setup(seed=2)
    mesh = make_mesh(dp=1, tp=1, sp=4, devices=jax.devices()[:4])

    def loss_ring(q, k, v):
        o = ring_attention_sharded(q, k, v, mask, causal=causal, mesh=mesh)
        return (o * jnp.sin(o)).sum()

    def loss_ref(q, k, v):
        o = _xla_attention(q, k, v, mask, causal, None, 0.0, True, None)
        return (o * jnp.sin(o)).sum()

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=4e-4, atol=4e-4,
                                   err_msg=f"d{name} (causal={causal})")


@pytest.mark.slow
def test_encoder_sp_matches_dense():
    """PianoBart encoder under shard_map + ring attention == dense encoder."""
    from flax import linen as nn
    from pianobart_tpu.models import PianoBart, tiny_config
    from pianobart_tpu.parallel.sp import encode_sp

    cfg = tiny_config(max_len=128, d_model=128, num_heads=1, emb_size=16)
    # head_dim must be lane-aligned for the flash kernel; tiny cfg uses
    # interpret mode on CPU so 128/1 = 128 is fine
    model_dense = PianoBart(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (2, cfg.max_len, 8), 0, 30)
    mask = jnp.ones((2, cfg.max_len)).at[1, 100:].set(0.0)
    params = model_dense.init(rng, ids, None, mask)
    dense = model_dense.apply(params, ids, None, mask)

    cfg_sp = cfg.replace(ring_axis="sp", use_flash_attention=False)
    model_sp = PianoBart(cfg_sp)
    mesh = make_mesh(dp=1, tp=1, sp=4, devices=jax.devices()[:4])
    out = encode_sp(model_sp, params, ids, mask, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)
