"""Polyak (EMA) parameter averaging — make_optimizer(ema_decay=...).

Beyond-reference trainer feature: a shadow parameter average rides in
``opt_state`` (checkpointed for free), evaluation/best-selection use it via
``runner._eval_state``, and ``export-ckpt --ema`` /
``CheckpointManager.restore_ema_params`` extract it from saved checkpoints.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu.train.runner import _eval_state
from pianobart_tpu.train.state import (CheckpointManager, TrainState,
                                       get_ema_params, make_optimizer)


def _state(ema_decay=None, accum_steps=1, lr=0.1):
    params = {"w": jnp.asarray([1.0, -2.0])}
    tx = make_optimizer(lr, weight_decay=0.0, ema_decay=ema_decay,
                        accum_steps=accum_steps)
    return TrainState.create(apply_fn=None, params=params, tx=tx)


def test_ema_tracks_post_update_params_closed_form():
    d = 0.5
    state = _state(ema_decay=d)
    p0 = np.asarray(state.params["w"])
    # ema initializes to the initial params (no zero-init bias)
    np.testing.assert_array_equal(
        np.asarray(get_ema_params(state.opt_state)["w"]), p0)

    g = {"w": jnp.asarray([0.3, -0.1])}
    state = state.apply_gradients(grads=g)
    p1 = np.asarray(state.params["w"])
    ema1 = np.asarray(get_ema_params(state.opt_state)["w"])
    np.testing.assert_allclose(ema1, d * p0 + (1 - d) * p1, rtol=1e-6)

    state = state.apply_gradients(grads=g)
    p2 = np.asarray(state.params["w"])
    ema2 = np.asarray(get_ema_params(state.opt_state)["w"])
    np.testing.assert_allclose(ema2, d * ema1 + (1 - d) * p2, rtol=1e-6)
    assert not np.allclose(ema2, p2)  # shadow lags the raw params


def test_ema_advances_once_per_real_update_under_accumulation():
    state = _state(ema_decay=0.5, accum_steps=2)
    p0 = np.asarray(state.params["w"])
    g = {"w": jnp.asarray([0.5, 0.5])}
    state = state.apply_gradients(grads=g)   # micro-step: no param update
    np.testing.assert_array_equal(
        np.asarray(get_ema_params(state.opt_state)["w"]), p0)
    state = state.apply_gradients(grads=g)   # real update
    ema = np.asarray(get_ema_params(state.opt_state)["w"])
    p1 = np.asarray(state.params["w"])
    np.testing.assert_allclose(ema, 0.5 * p0 + 0.5 * p1, rtol=1e-6)


def test_get_ema_params_none_without_ema():
    state = _state()
    assert get_ema_params(state.opt_state) is None
    # the params passthrough convenience
    assert get_ema_params(state.opt_state, state.params) is state.params
    # and _eval_state returns the state untouched
    assert _eval_state(state) is state


def test_eval_state_swaps_in_the_shadow():
    state = _state(ema_decay=0.9)
    g = {"w": jnp.asarray([1.0, 1.0])}
    state = state.apply_gradients(grads=g)
    es = _eval_state(state)
    np.testing.assert_array_equal(
        np.asarray(es.params["w"]),
        np.asarray(get_ema_params(state.opt_state)["w"]))
    # training state untouched
    assert es is not state
    assert es.opt_state is state.opt_state


def test_ema_checkpoint_roundtrip_and_raw_extraction(tmp_path):
    state = _state(ema_decay=0.5)
    g = {"w": jnp.asarray([0.2, 0.4])}
    state = state.apply_gradients(grads=g)
    ema = np.asarray(get_ema_params(state.opt_state)["w"])

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, {"weighted_acc": 0.1}, is_best=True)

    # structured resume keeps the shadow
    fresh = _state(ema_decay=0.5)
    restored, _ = CheckpointManager(str(tmp_path / "ckpt")).restore(fresh)
    np.testing.assert_allclose(
        np.asarray(get_ema_params(restored.opt_state)["w"]), ema, rtol=1e-6)

    # raw extraction (export-ckpt --ema path): graft onto a params template
    template = {"w": np.zeros(2, np.float32)}
    got = CheckpointManager(str(tmp_path / "ckpt")).restore_ema_params(
        template)
    np.testing.assert_allclose(got["w"], ema, rtol=1e-6)


def test_raw_restore_returns_plain_numpy(tmp_path):
    """_raw_restore must come back as np.ndarray leaves, NOT jax.Arrays:
    a target-less StandardCheckpointer restore rebuilds the SAVED shardings
    and dies when the restoring process has a different device topology
    (found exporting a 2-device-mesh checkpoint from a 1-device process)."""
    state = _state(ema_decay=0.5)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, {"weighted_acc": 0.1}, is_best=True)
    raw = CheckpointManager(str(tmp_path / "ckpt"))._raw_restore(
        str(tmp_path / "ckpt" / "best"))
    leaves = jax.tree_util.tree_leaves(raw)
    assert leaves and all(isinstance(l, np.ndarray) for l in leaves), (
        [type(l) for l in leaves[:3]])


def test_restore_ema_params_fails_clearly_without_ema(tmp_path):
    state = _state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, {"weighted_acc": 0.1}, is_best=True)
    with pytest.raises(FileNotFoundError, match="ema_decay"):
        CheckpointManager(str(tmp_path / "ckpt")).restore_ema_params(
            {"w": np.zeros(2, np.float32)})


def test_pretrain_runner_selects_best_on_ema_metrics(tmp_path):
    """End-to-end: a runner over an EMA optimizer evaluates with the shadow
    (the eval loss differs from the raw-params eval) and still trains."""
    from flax import linen as nn
    from pianobart_tpu import vocab as V
    from pianobart_tpu.models import PianoBartLM, tiny_config
    from pianobart_tpu.train.pretrain import pretrain_eval_step
    from pianobart_tpu.train.runner import PretrainRunner

    cfg = tiny_config()
    model = PianoBartLM(cfg)
    B, S = 2, cfg.max_len
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((B, S, 8), jnp.int32)
    m = jnp.ones((B, S))
    params = nn.meta.unbox(model.init(rng, ids, ids, m, m))["params"]
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(5e-2, ema_decay=0.9))
    npr = np.random.default_rng(0)
    x = np.zeros((4, S, 8), np.int32)
    for f in range(8):
        x[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (4, S))

    runner = PretrainRunner(state, cfg, x, x, str(tmp_path), batch_size=2,
                            steps_per_dispatch=2)
    runner.run(1)
    # with a large lr and decay 0.9 the shadow demonstrably lags: eval under
    # raw params vs the runner's _eval_state must differ
    w = jnp.ones(2)
    rng_b = jax.random.fold_in(runner.rng, 0)
    batch = jnp.asarray(x[:2])
    raw = float(pretrain_eval_step(runner.state, batch, rng_b, w, cfg,
                                   0.15)["loss"])
    ema = float(pretrain_eval_step(_eval_state(runner.state), batch, rng_b,
                                   w, cfg, 0.15)["loss"])
    assert raw != ema
