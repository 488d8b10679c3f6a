"""Epoch runners end-to-end on tiny data (CPU)."""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu import vocab as V
from pianobart_tpu.models import (PianoBartLM, SequenceClassification,
                                  TokenClassification, tiny_config)
from pianobart_tpu.train.finetune import finetune_seq_step, finetune_token_step
from pianobart_tpu.train.generation import ablation_step, generation_step
from pianobart_tpu.train.runner import SupervisedRunner
from pianobart_tpu.train.state import create_train_state


def make_ids(rng, n, S):
    x = np.zeros((n, S, 8), dtype=np.int64)
    for f in range(8):
        x[..., f] = rng.integers(0, V.TOKEN_BOUNDARY[f], (n, S))
    return x


def test_seq_classification_runner(rng, tmp_path):
    cfg = tiny_config()
    S = cfg.max_len
    model = SequenceClassification(cfg, class_num=4)
    X = make_ids(rng, 12, S)
    y = rng.integers(0, 4, 12)
    key = jax.random.PRNGKey(0)
    state = create_train_state(
        model, cfg, key,
        (jnp.zeros((2, S, 8), jnp.int32), jnp.ones((2, S))),
        learning_rate=1e-3)

    def step_fn(state, bx, by, rng_, train=True, weight=None):
        return finetune_seq_step(state, bx, by, rng_, cfg=cfg, train=train,
                                 weight=weight)

    data = (X[:8], X[8:10], X[10:], y[:8], y[8:10], y[10:])
    runner = SupervisedRunner(state, cfg, step_fn, data, str(tmp_path / "r"),
                              batch_size=4, patience=5)
    runner.run(epochs=2)
    assert os.path.exists(tmp_path / "r" / "log")
    assert os.path.exists(tmp_path / "r" / "best")


def test_token_classification_velocity_runner(rng, tmp_path):
    cfg = tiny_config(decoder_label_vocab=8)
    S = cfg.max_len
    model = TokenClassification(cfg, class_num=8)
    X = make_ids(rng, 8, S)
    y = rng.integers(0, 7, (8, S))
    key = jax.random.PRNGKey(0)
    state = create_train_state(
        model, cfg, key,
        (jnp.zeros((2, S, 8), jnp.int32), jnp.zeros((2, S), jnp.int32),
         jnp.ones((2, S)), jnp.ones((2, S))),
        learning_rate=1e-3)

    def step_fn(state, bx, by, rng_, train=True, weight=None):
        return finetune_token_step(state, bx, by, rng_, cfg=cfg,
                                   velocity=True, train=train, weight=weight)

    data = (X[:4], X[4:6], X[6:], y[:4], y[4:6], y[6:])
    runner = SupervisedRunner(state, cfg, step_fn, data, str(tmp_path / "v"),
                              batch_size=2, patience=5)
    runner.run(epochs=1)


def test_generation_runner_with_fad(rng, tmp_path):
    cfg = tiny_config()
    S = cfg.max_len
    model = PianoBartLM(cfg)
    X = make_ids(rng, 8, S)
    Y = make_ids(rng, 8, S)
    key = jax.random.PRNGKey(0)
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    state = create_train_state(model, cfg, key, (ids, ids, m, m),
                               learning_rate=1e-3)

    def step_fn(state, bx, by, rng_, train=True, weight=None):
        return generation_step(state, bx, by, rng_, cfg=cfg, train=train,
                               weight=weight)

    from pianobart_tpu.utils.fad import generation_fad

    def eval_hook(bx, by, metrics):
        fad, fad_bar = generation_fad(by, np.asarray(metrics["outputs"]),
                                      np.asarray(metrics["attn_dec"]))
        return {"fad": fad, "fad_bar": fad_bar}

    data = (X[:4], X[4:6], X[6:], Y[:4], Y[4:6], Y[6:])
    runner = SupervisedRunner(state, cfg, step_fn, data, str(tmp_path / "g"),
                              batch_size=2, patience=5,
                              select="weighted_field_acc", eval_hook=eval_hook)
    runner.run(epochs=1)
    import json
    lines = [json.loads(l) for l in
             open(tmp_path / "g" / "metrics.jsonl")]
    epoch = [l for l in lines if l["event"] == "epoch"][0]
    assert "fad" in epoch["valid"]


def test_ablation_step_masks_second_half(rng):
    cfg = tiny_config()
    S = cfg.max_len
    model = PianoBartLM(cfg)
    key = jax.random.PRNGKey(0)
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    state = create_train_state(model, cfg, key, (ids, ids, m, m),
                               learning_rate=1e-3)
    batch = jnp.asarray(make_ids(rng, 2, S))
    state, metrics = ablation_step(state, batch, key, cfg=cfg, train=True)
    assert np.isfinite(float(metrics["loss"]))
    lm = np.asarray(metrics["loss_mask"])
    # loss covers positions len/2+1 .. len (Ablation.py:134-139); here all
    # rows are content so len == S and the mask is the second half
    assert lm[:, S // 2 + 1:].all() and not lm[:, :S // 2].any()


def test_valid_epoch_rng_distinct_per_batch_deterministic_per_epoch(
        rng, tmp_path):
    """Eval corruption keys must differ per batch (round-2 verdict: one key
    for the whole split meant only batch_size distinct corruption draws) yet
    stay identical across epochs (determinism)."""
    from pianobart_tpu.models import PianoBartLM, tiny_config
    from pianobart_tpu.train.runner import PretrainRunner
    from pianobart_tpu.train.state import TrainState, make_optimizer
    from flax import linen as nn

    cfg = tiny_config()
    model = PianoBartLM(cfg)
    S = cfg.max_len
    ids = jnp.zeros((1, S, 8), jnp.int32)
    m = jnp.ones((1, S))
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), ids, ids, m, m))
    state = TrainState.create(apply_fn=model.apply,
                              params=params["params"], tx=make_optimizer())
    data = make_ids(rng, 6, S).astype(np.int32)

    seen = []

    def record_eval(state, batch, rng_, w):
        seen.append(np.asarray(jax.random.key_data(rng_)).tolist())
        return {"loss": jnp.float32(0.0), "field_acc": jnp.zeros(8)}

    runner = PretrainRunner(state, cfg, data, data, str(tmp_path),
                            batch_size=2, eval_step_fn=record_eval)
    runner.valid_epoch()
    n_batches = len(seen)
    assert n_batches == 3
    assert len({tuple(s) for s in seen}) == n_batches  # distinct per batch
    first = list(seen)
    seen.clear()
    runner.valid_epoch()
    assert seen == first                               # deterministic


def test_pretrain_runner_warns_on_zero_steps(rng, tmp_path, capsys):
    """A dataset smaller than batch_size must not silently report loss 0.0
    (drop_last leaves zero train batches)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from pianobart_tpu.models import PianoBartLM, tiny_config
    from pianobart_tpu.train.runner import PretrainRunner
    from pianobart_tpu.train.state import TrainState, make_optimizer

    cfg = tiny_config()
    model = PianoBartLM(cfg)
    S = cfg.max_len
    ids = jnp.zeros((1, S, 8), jnp.int32)
    m = jnp.ones((1, S))
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), ids, ids, m, m))
    state = TrainState.create(apply_fn=model.apply,
                              params=params["params"], tx=make_optimizer())
    data = np.zeros((1, S, 8), dtype=np.int32)   # 1 sequence < batch_size 4
    runner = PretrainRunner(state, cfg, data, data, str(tmp_path),
                            batch_size=4)
    out = runner.train_epoch()
    assert out["steps"] == 0
    assert "0 train steps" in capsys.readouterr().err


def _tiny_state():
    from flax import linen as nn
    from pianobart_tpu.models import PianoBartLM, tiny_config
    from pianobart_tpu.train.state import TrainState, make_optimizer
    cfg = tiny_config()
    model = PianoBartLM(cfg)
    S = cfg.max_len
    ids = jnp.zeros((1, S, 8), jnp.int32)
    m = jnp.ones((1, S))
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), ids, ids, m, m))
    return cfg, TrainState.create(apply_fn=model.apply,
                                  params=params["params"],
                                  tx=make_optimizer())


def test_safety_checkpoint_separate_namespace(tmp_path):
    """Mid-epoch safety saves live outside the step_N epoch namespace: a
    round-3 review found them saved under the raw optimizer step, which
    restore() then read back as an epoch index (resume skipped all
    remaining epochs) and which crowded real epoch saves out of GC."""
    from pianobart_tpu.train.state import CheckpointManager
    cfg, state = _tiny_state()
    ckpt = CheckpointManager(str(tmp_path))

    # epoch 0 and 1 complete; a safety save fires mid-epoch-2 with a large
    # optimizer step
    ckpt.save(1, state, {"weighted_acc": 0.1}, is_best=True)
    ckpt.save(2, state, {"weighted_acc": 0.2}, is_best=True)
    state2 = state.replace(step=600)
    ckpt.save_safety(state2, epoch=2)
    assert not os.path.exists(tmp_path / "step_600")
    assert os.path.exists(tmp_path / "safety")

    # resume: the pending safety slot wins and restarts epoch 2
    restored, start = ckpt.restore(state)
    assert start == 2
    assert int(restored.step) == 600

    # epoch 2 completes -> the epoch save supersedes the safety slot
    ckpt.save(3, state2.replace(step=601), {"weighted_acc": 0.3},
              is_best=True)
    assert not os.path.exists(tmp_path / "safety")
    _, start = ckpt.restore(state)
    assert start == 3


def test_resume_restores_best_acc(tmp_path):
    """The first post-resume epoch must not clobber a better best/ copy:
    round-3 review found best_acc reset to -1.0 on resume in both
    runners."""
    from pianobart_tpu.train.runner import PretrainRunner, SupervisedRunner
    from pianobart_tpu.train.state import CheckpointManager
    cfg, state = _tiny_state()
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(1, state, {"weighted_acc": 0.9}, is_best=True)

    S = cfg.max_len
    data = np.zeros((2, S, 8), dtype=np.int32)
    runner = PretrainRunner(state, cfg, data, data, str(tmp_path),
                            batch_size=2)
    runner.run(epochs=1, resume=True)   # start==1: no epochs execute
    assert runner.best_acc == pytest.approx(0.9)

    sup = SupervisedRunner(state, cfg, lambda *a, **k: None,
                           (data, data, data, None, None, None),
                           str(tmp_path), batch_size=2)
    sup.run(epochs=1, resume=True)
    assert sup.best == pytest.approx(0.9)


def test_supervised_runner_shards_batches_on_dp(tmp_path):
    """SupervisedRunner must place inputs/labels on the mesh's dp axis —
    a round-3 review found multi-chip finetunes replicating every batch
    (each chip redundantly computing the full batch)."""
    from pianobart_tpu.parallel.mesh import make_mesh, put_batch_fn
    cfg, state = _tiny_state()
    mesh = make_mesh(dp=2, tp=1, sp=1)
    S = cfg.max_len
    X = np.zeros((4, S, 8), dtype=np.int32)
    y = np.zeros((4,), dtype=np.int32)
    seen = []

    def step_fn(state, bx, by, rng, train=True, weight=None):
        seen.append((bx.sharding.spec, by.sharding.spec))
        return state, {"loss": jnp.float32(0.0), "acc_num": jnp.float32(1.0),
                       "acc_den": jnp.float32(1.0)}

    runner = SupervisedRunner(state, cfg, step_fn,
                              (X, X, X, y, y, y), str(tmp_path),
                              batch_size=2, put_batch=put_batch_fn(mesh))
    with mesh:
        runner.run(epochs=1, run_test_each_epoch=False)
    assert seen, "no steps ran"
    for spec_x, spec_y in seen:
        assert spec_x[0] == "dp", spec_x
        assert spec_y[0] == "dp", spec_y


def test_early_stop_writes_structured_event_and_counts_complete(
        rng, tmp_path, monkeypatch):
    """Patience exhaustion must leave a machine-readable ``early_stop``
    event in metrics.jsonl (train/runner.py), and real_data_e2e's stage
    cache must treat such a run as complete even though it recorded fewer
    epochs than requested (an early-stopped run re-trained on every e2e
    rerun otherwise)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.real_data_e2e import _read_run, run_complete

    from pianobart_tpu.models import tiny_config as _tiny
    cfg = _tiny()
    S = cfg.max_len
    model = SequenceClassification(cfg, class_num=4)
    X = make_ids(rng, 8, S)
    y = rng.integers(0, 4, 8)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        (jnp.zeros((2, S, 8), jnp.int32), jnp.ones((2, S))),
        learning_rate=1e-3)

    def step_fn(state, bx, by, rng_, train=True, weight=None):
        return finetune_seq_step(state, bx, by, rng_, cfg=cfg, train=train,
                                 weight=weight)

    # force a strictly decreasing selection score: epoch 1 is best, epoch 2
    # exhausts patience=0 and must stop the requested-6-epoch run
    scores = iter([1.0, 0.5, 0.4, 0.3, 0.2, 0.1])
    monkeypatch.setattr(SupervisedRunner, "_selection_score",
                        lambda self, va: next(scores))
    data = (X[:4], X[4:6], X[6:], y[:4], y[4:6], y[6:])
    runner = SupervisedRunner(state, cfg, step_fn, data, str(tmp_path / "es"),
                              batch_size=2, patience=0)
    runner.run(epochs=6)

    jsonl = str(tmp_path / "es" / "metrics.jsonl")
    epochs, early = _read_run(jsonl)
    assert len(epochs) == 2 and early
    assert run_complete(jsonl, 6)
    assert run_complete(jsonl, 2)  # enough epochs alone also completes

    # a rerun that starts over resets BOTH the epoch list and the flag
    with open(jsonl, "a") as f:
        f.write('{"event": "epoch", "epoch": 1, "train": {}, "valid": {}}\n')
    epochs2, early2 = _read_run(jsonl)
    assert len(epochs2) == 1 and not early2
    assert not run_complete(jsonl, 6)


def test_e2e_sh_timeout_is_a_loud_failure(tmp_path, monkeypatch):
    """real_data_e2e.sh(timeout=...) must turn a HUNG subcommand into a
    SystemExit naming the timeout (round 5: a dead TPU RPC left a demo
    blocked forever, stalling every later stage) — and the message is the
    contract try_demo uses to report 'n/a (timed out)' instead of a
    misleading model-failure 'NO'."""
    import subprocess
    import sys as _sys
    import pytest
    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts import real_data_e2e as e2e

    def fake_run(cmd, **kw):
        assert kw["timeout"] == 7
        raise subprocess.TimeoutExpired(cmd, kw["timeout"],
                                        output="partial stage output")
    monkeypatch.setattr(e2e.subprocess, "run", fake_run)
    with pytest.raises(SystemExit) as exc:
        e2e.sh(["demo", "--input", "x.mid"], cwd=str(tmp_path), timeout=7)
    assert "timed out" in str(exc.value)

    # a plain failure (nonzero exit) raises WITHOUT the timeout marker
    def fake_run_fail(cmd, **kw):
        return subprocess.CompletedProcess(cmd, 1, stdout="out", stderr="err")
    monkeypatch.setattr(e2e.subprocess, "run", fake_run_fail)
    with pytest.raises(SystemExit) as exc2:
        e2e.sh(["demo"], cwd=str(tmp_path))
    assert "timed out" not in str(exc2.value)
