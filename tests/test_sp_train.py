"""Sequence-parallel train step == dense train step (loss AND grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pianobart_tpu import vocab as V
from pianobart_tpu.models import PianoBartLM, tiny_config
from pianobart_tpu.ops.noise import corrupt_batch
from pianobart_tpu.parallel.mesh import make_mesh
from pianobart_tpu.train.objective import masked_field_ce, shift_right
from pianobart_tpu.train.pretrain_sp import make_sp_pretrain_step
from pianobart_tpu.train.state import TrainState, make_optimizer


@pytest.mark.slow
def test_sp_train_step_matches_dense(rng):
    S = 128
    base = tiny_config(max_len=S, d_model=128, num_heads=1, emb_size=16,
                       dropout=0.0)
    cfg_sp = base.replace(ring_axis="sp", use_flash_attention=False)

    B = 4
    batch = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        batch[..., f] = rng.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    batch = jnp.asarray(batch)
    key = jax.random.PRNGKey(3)

    dense_model = PianoBartLM(base)
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    params = nn.meta.unbox(dense_model.init(key, ids, ids, m, m))["params"]

    # dense loss (deterministic, same corruption rng chain as the sp step)
    state0 = TrainState.create(apply_fn=dense_model.apply, params=params,
                               tx=make_optimizer(1e-3))
    rngc, _ = jax.random.split(jax.random.fold_in(key, state0.step))
    corrupted, loss_mask = corrupt_batch(rngc, batch, 0.15)
    dec = shift_right(batch, jnp.asarray(V.SOS, jnp.int32))
    enc_mask = (corrupted[..., 0] != V.PAD[0]).astype(jnp.float32)
    dec_mask = (dec[..., 0] != V.PAD[0]).astype(jnp.float32)

    def dense_loss(p):
        fused = dense_model.apply({"params": p}, corrupted, dec, enc_mask,
                                  dec_mask, True)
        return masked_field_ce(fused, batch, loss_mask, base)[0]

    dloss, dgrads = jax.value_and_grad(dense_loss)(params)

    # sp step over a 2x2 dp×sp mesh (donated state gets fresh param copies)
    mesh = make_mesh(dp=2, tp=1, sp=2, devices=jax.devices()[:4])
    step = make_sp_pretrain_step(cfg_sp, mesh, 0.15)
    state = TrainState.create(apply_fn=None,
                              params=jax.tree.map(jnp.copy, params),
                              tx=make_optimizer(1e-3))
    state, metrics = step(state, batch, key)
    assert float(metrics["loss"]) == pytest.approx(float(dloss), rel=2e-5)

    # gradient parity: run with SGD(lr=1) so params_new = params - grads
    import optax
    state2 = TrainState.create(apply_fn=None,
                               params=jax.tree.map(jnp.copy, params),
                               tx=optax.sgd(1.0))
    state2, _ = step(state2, batch, key)
    sp_grads = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                            params, state2.params)
    flat_d = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(dgrads)])
    flat_s = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(sp_grads)])
    np.testing.assert_allclose(flat_s, flat_d, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_tp_sp_composed_train_step_matches_dense(rng):
    """TP∘SP: head-sharded tensor parallelism INSIDE the ring shard_map
    (cfg.ring_tp_axis) must reproduce the dense step's loss and gradients —
    the explicit custom-VJP collectives (ops/ring.py replicated_in /
    psum_out / tp_slice) are what keeps grads exact under check_vma=False."""
    S = 128
    base = tiny_config(max_len=S, d_model=128, num_heads=2, emb_size=16,
                       dropout=0.0)
    cfg_tpsp = base.replace(ring_axis="sp", ring_tp_axis="tp",
                            ring_tp_size=2, use_flash_attention=False)

    B = 4
    batch = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        batch[..., f] = rng.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    batch = jnp.asarray(batch)
    key = jax.random.PRNGKey(5)

    dense_model = PianoBartLM(base)
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    params = nn.meta.unbox(dense_model.init(key, ids, ids, m, m))["params"]

    state0 = TrainState.create(apply_fn=dense_model.apply, params=params,
                               tx=make_optimizer(1e-3))
    rngc, _ = jax.random.split(jax.random.fold_in(key, state0.step))
    corrupted, loss_mask = corrupt_batch(rngc, batch, 0.15)
    dec = shift_right(batch, jnp.asarray(V.SOS, jnp.int32))
    enc_mask = (corrupted[..., 0] != V.PAD[0]).astype(jnp.float32)
    dec_mask = (dec[..., 0] != V.PAD[0]).astype(jnp.float32)

    def dense_loss(p):
        fused = dense_model.apply({"params": p}, corrupted, dec, enc_mask,
                                  dec_mask, True)
        return masked_field_ce(fused, batch, loss_mask, base)[0]

    dloss, dgrads = jax.value_and_grad(dense_loss)(params)

    mesh = make_mesh(dp=2, tp=2, sp=2)
    step = make_sp_pretrain_step(cfg_tpsp, mesh, 0.15)
    state = TrainState.create(apply_fn=None,
                              params=jax.tree.map(jnp.copy, params),
                              tx=make_optimizer(1e-3))
    state, metrics = step(state, batch, key)
    assert float(metrics["loss"]) == pytest.approx(float(dloss), rel=2e-5)

    import optax
    state2 = TrainState.create(apply_fn=None,
                               params=jax.tree.map(jnp.copy, params),
                               tx=optax.sgd(1.0))
    state2, _ = step(state2, batch, key)
    sp_grads = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                            params, state2.params)
    flat_d = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(dgrads)])
    flat_s = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(sp_grads)])
    np.testing.assert_allclose(flat_s, flat_d, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_sp_longer_than_max_len_runs(rng):
    """Sequences of n_sp * local_len flow through weights sized for
    local_len (positional table covers max_len per shard)."""
    S_local = 64
    n_sp = 4
    S_global = S_local * n_sp
    cfg = tiny_config(max_len=S_global, d_model=128, num_heads=1,
                      emb_size=16, dropout=0.0).replace(
        ring_axis="sp", use_flash_attention=False)
    from pianobart_tpu.models import PianoBart
    from pianobart_tpu.parallel.sp import encode_sp

    model = PianoBart(cfg)
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (1, S_global, 8), 0, 30)
    mask = jnp.ones((1, S_global))
    # init with the dense twin (axis_index only exists under shard_map)
    params = PianoBart(cfg.replace(ring_axis=None)).init(key, ids, None, mask)
    mesh = make_mesh(dp=1, tp=1, sp=n_sp, devices=jax.devices()[:n_sp])
    out = encode_sp(model, params, ids, mask, mesh)
    assert out.shape == (1, S_global, cfg.d_model)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_sp_eval_step_matches_dense_eval(rng):
    """make_sp_eval_step == pretrain_eval_step (loss + per-field accs) for
    the same corruption rng on a dp×sp mesh, incl. zero-weighted tail rows."""
    from pianobart_tpu.train.pretrain import pretrain_eval_step
    from pianobart_tpu.train.pretrain_sp import make_sp_eval_step

    S, B = 128, 4
    base = tiny_config(max_len=S, d_model=128, num_heads=1, emb_size=16,
                       dropout=0.0)
    cfg_sp = base.replace(ring_axis="sp", use_flash_attention=False)
    batch = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        batch[..., f] = rng.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    batch = jnp.asarray(batch)
    weight = jnp.asarray([1.0, 1.0, 1.0, 0.0])   # one padded tail row
    key = jax.random.PRNGKey(11)

    dense_model = PianoBartLM(base)
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    params = nn.meta.unbox(dense_model.init(key, ids, ids, m, m))["params"]
    state = TrainState.create(apply_fn=dense_model.apply, params=params,
                              tx=make_optimizer(1e-3))

    dense = pretrain_eval_step(state, batch, key, weight, base, 0.15)

    mesh = make_mesh(dp=2, tp=1, sp=2, devices=jax.devices()[:4])
    sp_eval = make_sp_eval_step(cfg_sp, mesh, 0.15)
    sp_state = TrainState.create(apply_fn=None,
                                 params=jax.tree.map(jnp.copy, params),
                                 tx=make_optimizer(1e-3))
    sp = sp_eval(sp_state, batch, key, weight)

    assert float(sp["loss"]) == pytest.approx(float(dense["loss"]), rel=2e-5)
    np.testing.assert_allclose(np.asarray(sp["field_acc"]),
                               np.asarray(dense["field_acc"]),
                               rtol=1e-5, atol=1e-6)
