"""Pretrain step: single-device correctness + multi-device mesh sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu import vocab as V
from pianobart_tpu.models import PianoBartLM, tiny_config
from pianobart_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                         shard_params)
from pianobart_tpu.train.objective import (masked_field_ce, shift_right,
                                           weighted_average_accuracy)
from pianobart_tpu.train.pretrain import (batch_iterator, pretrain_eval_step,
                                          pretrain_step)
from pianobart_tpu.train.state import create_train_state


def make_batch(rng, B, S):
    x = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        x[..., f] = rng.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    x[:, 0] = np.sort(x[:, 0], axis=0)
    x[:, -1] = np.asarray(V.EOS)
    return jnp.asarray(x)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(dropout=0.1)
    model = PianoBartLM(cfg)
    rng = jax.random.PRNGKey(0)
    S = cfg.max_len
    ids = jnp.zeros((2, S, 8), jnp.int32)
    mask = jnp.ones((2, S))
    state = create_train_state(model, cfg, rng, (ids, ids, mask, mask),
                               learning_rate=1e-3)
    return cfg, model, state


def test_shift_right():
    ids = jnp.arange(2 * 4 * 8).reshape(2, 4, 8)
    out = shift_right(ids, jnp.asarray(V.SOS))
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.tile(np.asarray(V.SOS), (2, 1)))
    np.testing.assert_array_equal(np.asarray(out[:, 1:]), np.asarray(ids[:, :-1]))


def test_masked_ce_ignores_unmasked(setup, rng):
    cfg, model, state = setup
    B, S = 2, cfg.max_len
    batch = make_batch(rng, B, S)
    fused = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.total_vocab))
    mask0 = jnp.zeros((B, S, 8))
    total, per = masked_field_ce(fused, batch, mask0, cfg)
    assert float(total) == 0.0
    mask1 = jnp.ones((B, S, 8))
    total1, _ = masked_field_ce(fused, batch, mask1, cfg)
    assert float(total1) > 0.0


def test_pretrain_step_reduces_loss(setup, rng):
    cfg, model, state = setup
    # pretrain_step donates its input state; work on a copy so the
    # module-scoped fixture survives for later tests.
    state = jax.tree.map(jnp.copy, state)
    batch = make_batch(rng, 4, cfg.max_len)
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(8):
        state, metrics = pretrain_step(state, batch, key, cfg, 0.15)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert metrics["field_acc"].shape == (8,)
    assert 0.0 <= float(metrics["weighted_acc"]) <= 1.0


def test_eval_step_sample_weight(setup, rng):
    cfg, model, state = setup
    batch = make_batch(rng, 4, cfg.max_len)
    w_all = jnp.ones(4)
    w_half = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    m1 = pretrain_eval_step(state, batch, jax.random.PRNGKey(0), w_all, cfg)
    m2 = pretrain_eval_step(state, batch, jax.random.PRNGKey(0), w_half, cfg)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_batch_iterator_tail_padding(rng):
    data = np.arange(10 * 4 * 8).reshape(10, 4, 8)
    batches = list(batch_iterator(data, 4, rng, shuffle=False, drop_last=False))
    assert len(batches) == 3
    b, w = batches[-1]
    assert b.shape == (4, 4, 8)
    np.testing.assert_array_equal(w, [1, 1, 0, 0])


def test_pretrain_step_on_dp_tp_mesh(rng):
    """Full train step over a 4x2 dp×tp virtual mesh (multi-chip dryrun)."""
    cfg = tiny_config(dropout=0.0)
    model = PianoBartLM(cfg)
    key = jax.random.PRNGKey(0)
    S = cfg.max_len
    ids = jnp.zeros((8, S, 8), jnp.int32)
    mask = jnp.ones((8, S))

    mesh = make_mesh(dp=4, tp=2, sp=1)
    variables = model.init(key, ids, ids, mask, mask)
    params, shardings = shard_params(variables, mesh)

    from pianobart_tpu.train.state import TrainState, make_optimizer
    state = TrainState.create(apply_fn=model.apply,
                              params=params["params"],
                              tx=make_optimizer(1e-3))
    batch = jax.device_put(make_batch(rng, 8, S), batch_sharding(mesh))
    state, metrics = pretrain_step(state, batch, key, cfg, 0.15)
    assert np.isfinite(float(metrics["loss"]))
    # params stay sharded per their annotations
    kern = state.params["lm_head"]["proj"]["kernel"]
    assert len(kern.sharding.device_set) == 8


def test_pretrain_step_deterministic(setup, rng):
    """Same state + batch + key -> bit-identical loss (jit determinism)."""
    cfg, model, state = setup
    batch = make_batch(rng, 2, cfg.max_len)
    key = jax.random.PRNGKey(11)
    s1 = jax.tree.map(jnp.copy, state)
    s2 = jax.tree.map(jnp.copy, state)
    _, m1 = pretrain_step(s1, batch, key, cfg, 0.15)
    _, m2 = pretrain_step(s2, batch, key, cfg, 0.15)
    assert float(m1["loss"]) == float(m2["loss"])
    np.testing.assert_array_equal(np.asarray(m1["field_acc"]),
                                  np.asarray(m2["field_acc"]))
