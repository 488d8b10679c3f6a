"""Graceful preemption: SIGTERM → safety checkpoint → resume.

The reference loses everything since its last epoch-end ``torch.save`` on a
preemption (``main.py:65-100``; optimizer state is never reloaded).  Here the
runners finish the in-flight dispatch, write the rotating ``safety`` slot,
and ``--resume`` restarts the interrupted epoch from it
(utils/preemption.py, train/runner.py)."""
import functools
import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu import vocab as V
from pianobart_tpu.models import PianoBartLM, SequenceClassification, tiny_config
from pianobart_tpu.train.finetune import finetune_seq_step
from pianobart_tpu.train.pretrain import pretrain_step
from pianobart_tpu.train.runner import PretrainRunner, SupervisedRunner
from pianobart_tpu.train.state import create_train_state
from pianobart_tpu.utils.preemption import (EXIT_PREEMPTED, Preempted,
                                            PreemptionGuard)


def make_ids(rng, n, S):
    x = np.zeros((n, S, 8), dtype=np.int64)
    for f in range(8):
        x[..., f] = rng.integers(0, V.TOKEN_BOUNDARY[f], (n, S))
    return x


def test_guard_first_signal_flags_second_raises():
    g = PreemptionGuard().install()
    assert g is not None
    try:
        assert not g.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.requested
        # second signal = abort NOW (handlers restored inside the handler;
        # do not send a third — SIGTERM's default action would kill pytest)
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGTERM)
    finally:
        g.uninstall()


def _pretrain_state(cfg):
    model = PianoBartLM(cfg)
    S = cfg.max_len
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    return create_train_state(model, cfg, jax.random.PRNGKey(0),
                              (ids, ids, m, m), learning_rate=1e-3)


def test_pretrain_runner_preempts_and_resumes(rng, tmp_path):
    cfg = tiny_config()
    S = cfg.max_len
    X, Xv = make_ids(rng, 8, S), make_ids(rng, 4, S)
    save_dir = str(tmp_path / "p")
    guard = PreemptionGuard().install()
    assert guard is not None
    calls = {"n": 0}

    def step_fn(state, batch, rng_):
        calls["n"] += 1
        if calls["n"] == 2:  # the scheduler's SIGTERM lands mid-epoch
            os.kill(os.getpid(), signal.SIGTERM)
        return pretrain_step(state, batch, rng_, cfg, 0.15)

    runner = PretrainRunner(_pretrain_state(cfg), cfg, X, Xv, save_dir,
                            batch_size=2, steps_per_dispatch=1,
                            train_step_fn=step_fn, preempt=guard)
    try:
        with pytest.raises(Preempted):
            runner.run(epochs=2)
    finally:
        guard.uninstall()
    # the in-flight dispatch finished and the safety slot holds it
    meta = runner.ckpt.meta()
    assert meta["safety"] == {"epoch": 0, "opt_step": 2}
    assert os.path.exists(os.path.join(save_dir, "safety"))

    # fresh process: --resume restarts the interrupted epoch from the slot
    resumed = PretrainRunner(_pretrain_state(cfg), cfg, X, Xv, save_dir,
                             batch_size=2, steps_per_dispatch=1)
    resumed.run(epochs=1, resume=True)
    assert int(resumed.state.step) == 2 + len(X) // 2  # 2 saved + 1 epoch
    meta = resumed.ckpt.meta()
    assert meta.get("safety") is None  # epoch-end save cleared the slot
    assert meta["last_step"] == 1


def test_supervised_runner_preempts_and_resumes(rng, tmp_path):
    cfg = tiny_config()
    S = cfg.max_len
    model = SequenceClassification(cfg, class_num=4)
    X = make_ids(rng, 12, S)
    y = rng.integers(0, 4, 12)
    data = (X[:8], X[8:10], X[10:], y[:8], y[8:10], y[10:])

    def mk_state():
        return create_train_state(
            model, cfg, jax.random.PRNGKey(0),
            (jnp.zeros((2, S, 8), jnp.int32), jnp.ones((2, S))),
            learning_rate=1e-3)

    guard = PreemptionGuard()
    save_dir = str(tmp_path / "s")
    calls = {"n": 0}

    def step_fn(state, bx, by, rng_, train=True, weight=None):
        calls["n"] += 1
        if train:
            guard.requested = True  # preemption lands during batch 1
        return finetune_seq_step(state, bx, by, rng_, cfg=cfg, train=train,
                                 weight=weight)

    runner = SupervisedRunner(mk_state(), cfg, step_fn, data, save_dir,
                              batch_size=4, patience=5, preempt=guard)
    with pytest.raises(Preempted):
        runner.run(epochs=2)
    assert calls["n"] == 1  # checked right after the first train batch
    assert runner.ckpt.meta()["safety"]["epoch"] == 0

    resumed = SupervisedRunner(mk_state(), cfg, step_fn, data, save_dir,
                               batch_size=4, patience=5)
    resumed.run(epochs=1, resume=True)
    meta = resumed.ckpt.meta()
    assert meta.get("safety") is None
    assert meta["last_step"] == 1


def test_run_guarded_maps_preempted_to_tempfail_exit():
    from pianobart_tpu.cli import _run_guarded

    class Mesh:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class Runner:
        preempt = None

        def run(self, epochs, resume):
            raise Preempted("boom")

    before = signal.getsignal(signal.SIGTERM)
    assert _run_guarded(Mesh(), Runner(), 1, False) == EXIT_PREEMPTED
    # the finally-block uninstall restored the pre-existing handler
    assert signal.getsignal(signal.SIGTERM) is before
