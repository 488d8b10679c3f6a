"""Sharded vs unsharded numerical equivalence.

The same params + batch must produce the same loss/gradients regardless of
mesh layout (dp/tp/sp): XLA inserts collectives, the math cannot change.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from pianobart_tpu import vocab as V
from pianobart_tpu.models import PianoBartLM, tiny_config
from pianobart_tpu.parallel.mesh import (LOGICAL_RULES, batch_sharding,
                                         make_mesh, param_shardings)
from pianobart_tpu.train.objective import masked_field_ce, shift_right


@pytest.fixture(scope="module")
def setup(request):
    cfg = tiny_config(d_model=64, emb_size=32, ffn_dim=128, num_heads=4,
                      max_len=64)
    model = PianoBartLM(cfg)
    rng = jax.random.PRNGKey(0)
    B, S = 8, cfg.max_len
    npr = np.random.default_rng(0)
    batch = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        batch[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    variables = model.init(rng, ids, ids, m, m)
    return cfg, model, variables, jnp.asarray(batch)


def loss_fn(model, cfg):
    def f(params, batch):
        dec = shift_right(batch, jnp.asarray(V.SOS, jnp.int32))
        mask = (batch[..., 0] != V.PAD[0]).astype(jnp.float32)
        fused = model.apply({"params": params}, batch, dec, mask, mask, True)
        lm = jnp.ones(batch.shape, jnp.float32)
        return masked_field_ce(fused, batch, lm, cfg)[0]
    return f


@pytest.mark.parametrize("mesh_shape", [
    (2, 2, 2),  # the composed dp*tp*sp shape stays in the default suite
    pytest.param((8, 1, 1), marks=pytest.mark.slow),
    pytest.param((1, 4, 2), marks=pytest.mark.slow),
])
def test_loss_and_grads_match_across_meshes(setup, mesh_shape):
    cfg, model, variables, batch = setup
    f = loss_fn(model, cfg)
    params_ref = nn.meta.unbox(variables)["params"]
    base_loss = float(jax.jit(f)(params_ref, batch))
    base_grads = jax.jit(jax.grad(f))(params_ref, batch)

    dp, tp, sp = mesh_shape
    mesh = make_mesh(dp=dp, tp=tp, sp=sp)
    shardings = param_shardings(variables, mesh)["params"]
    params_sharded = jax.device_put(params_ref, shardings)
    batch_sharded = jax.device_put(batch, batch_sharding(mesh))
    with mesh, nn.logical_axis_rules(LOGICAL_RULES):
        loss = float(jax.jit(f)(params_sharded, batch_sharded))
        grads = jax.jit(jax.grad(f))(params_sharded, batch_sharded)
    assert loss == pytest.approx(base_loss, rel=1e-5)
    gnorm = lambda g: float(
        jnp.sqrt(sum((x.astype(jnp.float64) ** 2).sum()
                     for x in jax.tree.leaves(g))))
    assert gnorm(grads) == pytest.approx(gnorm(base_grads), rel=1e-5)
