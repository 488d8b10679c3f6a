"""Training observability: pre-clip gradient norms and LR logging.

Beyond-reference additions (the reference logs only loss/acc,
``pretrain.py:90-94``): every train step reports the pre-clip global
gradient norm, the runners aggregate it per epoch into metrics.jsonl and
the epoch log line, and — when an LR schedule is active — the current
learning rate is logged alongside (cli._make_lr_fn mirrors the optax
schedule on host, including the optax.MultiSteps inner-step semantics of
--accum_steps).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from pianobart_tpu import vocab as V
from pianobart_tpu.models import PianoBartLM, tiny_config
from pianobart_tpu.train.pretrain import pretrain_multi_step, pretrain_step
from pianobart_tpu.train.state import TrainState, make_optimizer


def _tiny_state_and_batch(B=2):
    cfg = tiny_config()
    model = PianoBartLM(cfg)
    S = cfg.max_len
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((B, S, 8), jnp.int32)
    m = jnp.ones((B, S))
    params = nn.meta.unbox(model.init(rng, ids, ids, m, m))["params"]
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(1e-3))
    npr = np.random.default_rng(0)
    x = np.zeros((B, S, 8), np.int32)
    for f in range(8):
        x[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    return cfg, state, jnp.asarray(x)


def test_pretrain_step_reports_grad_norm():
    cfg, state, x = _tiny_state_and_batch()
    rng = jax.random.PRNGKey(1)
    _, metrics = pretrain_step(state, x, rng, cfg, 0.15)
    g = float(metrics["grad_norm"])
    assert np.isfinite(g) and g > 0.0


def test_pretrain_step_grad_norm_matches_manual_grads():
    """metrics['grad_norm'] is the pre-clip optax.global_norm of the real
    gradients: recompute them outside the step with the identical rng
    derivation and compare."""
    from pianobart_tpu.ops.noise import corrupt_batch
    from pianobart_tpu.train.pretrain import _fast_dropout_key, _forward_loss

    cfg, state, x = _tiny_state_and_batch()
    rng = jax.random.PRNGKey(7)
    rc, rd = jax.random.split(jax.random.fold_in(rng, state.step))
    rd = _fast_dropout_key(rd)
    corrupted, loss_mask = corrupt_batch(rc, x, 0.15)
    grads = jax.grad(_forward_loss, has_aux=True)(
        state.params, state.apply_fn, x, corrupted, loss_mask, cfg,
        rd, False)[0]
    expect = float(optax.global_norm(grads))

    _, metrics = pretrain_step(state, x, rng, cfg, 0.15)
    np.testing.assert_allclose(float(metrics["grad_norm"]), expect,
                               rtol=1e-5)


def test_multi_step_returns_per_step_grad_norms():
    cfg, state, x = _tiny_state_and_batch()
    K = 3
    _, (losses, accs, gnorms) = pretrain_multi_step(
        state, x, jax.random.PRNGKey(2), cfg, 0.15, K)
    assert losses.shape == (K,) and gnorms.shape == (K,)
    g = np.asarray(gnorms)
    assert np.all(np.isfinite(g)) and np.all(g > 0)


def test_finetune_steps_report_grad_norm_train_only():
    from pianobart_tpu.models import SequenceClassification
    from pianobart_tpu.train.finetune import finetune_seq_step

    cfg = tiny_config()
    model = SequenceClassification(cfg, class_num=4)
    B, S = 2, cfg.max_len
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((B, S, 8), jnp.int32)
    m = jnp.ones((B, S))
    params = nn.meta.unbox(model.init(rng, ids, m))["params"]
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(1e-3))
    y = jnp.asarray([0, 2])
    state, mt = finetune_seq_step(state, ids, y, rng, cfg, train=True)
    assert float(mt["grad_norm"]) > 0
    _, me = finetune_seq_step(state, ids, y, rng, cfg, train=False)
    assert "grad_norm" not in me


def test_pretrain_runner_logs_grad_norm_and_lr(tmp_path):
    from pianobart_tpu.train.runner import PretrainRunner

    cfg, state, x = _tiny_state_and_batch()
    data = np.asarray(np.broadcast_to(np.asarray(x)[:1], (4,) + x.shape[1:]))
    from pianobart_tpu.train.state import make_schedule
    lr_sched = make_schedule(1e-3, "constant", warmup_steps=100)
    runner = PretrainRunner(state, cfg, data, data, str(tmp_path),
                            batch_size=2, steps_per_dispatch=2,
                            lr_fn=lambda s: float(lr_sched(s)))
    runner.run(1)
    recs = [json.loads(l) for l in
            open(os.path.join(tmp_path, "metrics.jsonl"))]
    epoch = [r for r in recs if r["event"] == "epoch"][0]
    assert epoch["train"]["grad_norm_mean"] > 0
    assert epoch["train"]["grad_norm_max"] >= epoch["train"]["grad_norm_mean"]
    assert 0 <= epoch["train"]["lr"] <= 1e-3
    logtxt = open(os.path.join(tmp_path, "log")).read()
    assert "gnorm=" in logtxt and "lr=" in logtxt


def test_lr_fn_mirrors_multisteps_inner_count():
    """cli._make_lr_fn divides the micro-step count by --accum_steps —
    matching when optax.MultiSteps actually advances the inner schedule."""
    import argparse

    from pianobart_tpu.cli import _make_lr_fn

    args = argparse.Namespace(lr_schedule="cosine", warmup_steps=2,
                              decay_steps=10, accum_steps=2)
    lr_fn = _make_lr_fn(args, 1e-3)
    # micro-steps 0..3 -> inner steps 0,0,1,1
    assert lr_fn(0) == lr_fn(1)
    assert lr_fn(2) == lr_fn(3)
    assert lr_fn(2) > lr_fn(0)
    # plain constant: nothing to log
    args2 = argparse.Namespace(lr_schedule="constant", warmup_steps=0,
                               decay_steps=None, accum_steps=1)
    assert _make_lr_fn(args2, 1e-3) is None


def test_sp_step_reports_grad_norm():
    from jax.sharding import Mesh
    from pianobart_tpu.train.pretrain_sp import make_sp_pretrain_step

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "sp"))
    cfg = tiny_config(dropout=0.0, use_flash_attention=False,
                      ring_axis="sp")
    B, S = 2, cfg.max_len
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((B, S, 8), jnp.int32)
    m = jnp.ones((B, S))
    params = nn.meta.unbox(PianoBartLM(cfg.replace(ring_axis=None)).init(
        rng, ids, ids, m, m))["params"]
    state = TrainState.create(apply_fn=None, params=params,
                              tx=make_optimizer(1e-3))
    npr = np.random.default_rng(0)
    x = np.zeros((B, S, 8), np.int32)
    for f in range(8):
        x[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    step = make_sp_pretrain_step(cfg, mesh, 0.15, axes=("dp", "sp"))
    _, metrics = step(state, jnp.asarray(x), rng)
    assert float(metrics["grad_norm"]) > 0
