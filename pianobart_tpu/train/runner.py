"""Epoch runners — the orchestration layer behind the CLI.

Mirrors ``main.py``'s four entry loops (pretrain / finetune /
finetune_generation / ablation): epoch iteration, vocab-weighted best-model
selection, patience-based early stop, checkpoint-every-epoch with a best
copy, and append-only epoch logs (``main.py:65-100, 186-211, 291-321``) —
rebuilt on jitted steps, orbax checkpoints with true resume, and jsonl
metrics.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import PianoBartConfig
from ..utils.logging import MetricsLogger
from ..utils.preemption import Preempted, PreemptionGuard
from .pretrain import (batch_iterator, pretrain_eval_step,
                       pretrain_multi_step)
from .state import CheckpointManager, TrainState, get_ema_params


def _eval_state(state: TrainState) -> TrainState:
    """State to evaluate with: params swapped for the Polyak shadow when the
    optimizer carries one (make_optimizer(ema_decay=...)); the raw training
    state otherwise.  Selection/best-checkpointing then follows the EMA
    metrics while resume keeps the true params+optimizer."""
    ema = get_ema_params(state.opt_state)
    return state if ema is None else state.replace(params=ema)


def _to_float(x):
    return float(np.asarray(x))


class PretrainRunner:
    """Pretraining epochs (main.py:17-100)."""

    def __init__(self, state: TrainState, cfg: PianoBartConfig,
                 train_data: np.ndarray, valid_data: np.ndarray,
                 save_dir: str, batch_size: int = 16,
                 mask_percent: float = 0.15, patience: int = 30,
                 seed: int = 2023, put_batch: Callable = jnp.asarray,
                 steps_per_dispatch: int = 8,
                 checkpoint_every_dispatches: int = 0,
                 train_step_fn: Optional[Callable] = None,
                 eval_step_fn: Optional[Callable] = None,
                 lr_fn: Optional[Callable] = None,
                 preempt: Optional[PreemptionGuard] = None):
        # preempt: graceful-shutdown flag polled at dispatch boundaries;
        # a pending request saves the mid-epoch safety checkpoint and
        # raises Preempted (utils/preemption.py)
        self.preempt = preempt
        # lr_fn(opt_step) -> float: host-side mirror of the optimizer's LR
        # schedule, logging only (cli._make_lr_fn builds it from the same
        # flags that built the optimizer)
        self.lr_fn = lr_fn
        # Custom step fns override the dense multi-step path (used by the
        # sequence-parallel trainer, train/pretrain_sp.py):
        #   train_step_fn(state, batch, rng) -> (state, metrics)
        #   eval_step_fn(state, batch, rng, sample_weight) -> metrics
        self.train_step_fn = train_step_fn
        self.eval_step_fn = eval_step_fn
        self.state = state
        self.cfg = cfg
        self.train_data = train_data
        self.valid_data = valid_data
        self.batch_size = batch_size
        self.mask_percent = mask_percent
        self.patience = patience
        self.put_batch = put_batch
        self.steps_per_dispatch = max(1, steps_per_dispatch)
        # mid-epoch safety checkpoints (0 = off); resume restarts the epoch
        # with the saved params/optimizer (the reference loses everything on
        # a crash: it only saves at epoch end and never reloads the
        # optimizer, SURVEY §5)
        self.checkpoint_every_dispatches = checkpoint_every_dispatches
        self.logger = MetricsLogger(save_dir)
        self.ckpt = CheckpointManager(save_dir)
        self.np_rng = np.random.default_rng(seed)
        self.rng = jax.random.PRNGKey(seed)
        self.best_acc = -1.0
        self.bad_epochs = 0
        self._cur_epoch = 0  # set by run(); safety saves record it

    def train_epoch(self) -> Dict[str, Any]:
        """Batches are grouped K-per-dispatch: one device program per K
        steps (lax.scan inside pretrain_multi_step) instead of K host round
        trips."""
        losses, accs, gnorms, n = [], [], [], 0
        t0 = time.time()
        tokens = 0
        K = self.steps_per_dispatch
        group: list = []
        it = batch_iterator(self.train_data, self.batch_size, self.np_rng,
                            shuffle=True)

        dispatches = 0

        def flush(group):
            nonlocal n, tokens, dispatches
            if not group:
                return
            stacked = np.stack(group)
            if self.train_step_fn is not None:
                ls_l, ac_l, gn_l = [], [], []
                for b in group:
                    self.state, m = self.train_step_fn(
                        self.state, self.put_batch(np.asarray(b)), self.rng)
                    ls_l.append(jnp.reshape(m["loss"], (1,)))
                    ac_l.append(m["field_acc"][None])
                    if "grad_norm" in m:
                        gn_l.append(jnp.reshape(m["grad_norm"], (1,)))
                ls = jnp.concatenate(ls_l)
                ac = jnp.concatenate(ac_l)
                gn = jnp.concatenate(gn_l) if gn_l else None
            else:
                self.state, (ls, ac, gn) = pretrain_multi_step(
                    self.state, self.put_batch(stacked), self.rng, self.cfg,
                    self.mask_percent, len(group))
            losses.append(ls)
            accs.append(ac)
            if gn is not None:
                gnorms.append(gn)
            tokens += stacked.shape[0] * stacked.shape[1] * stacked.shape[2]
            n += len(group)
            dispatches += 1
            if (self.checkpoint_every_dispatches
                    and dispatches % self.checkpoint_every_dispatches == 0):
                # dedicated safety slot: saving under the raw optimizer step
                # in the step_N EPOCH namespace made restore() read it back
                # as an epoch index (round-3 review), skipping all remaining
                # epochs on resume and confusing checkpoint GC
                self.ckpt.save_safety(self.state, self._cur_epoch)
            # pass device arrays: step_echo only materializes when it
            # actually prints, keeping dispatches async
            self.logger.step_echo(n, {"loss": ls[-1], "weighted_acc":
                                      ac[-1].mean()})
            self._check_preempt()

        for batch, _ in it:
            group.append(batch)
            if len(group) == K:
                flush(group)
                group = []
        flush(group)
        if n == 0:
            import sys
            print(f"WARNING: 0 train steps this epoch — {len(self.train_data)}"
                  f" sequences < batch_size {self.batch_size}; lower"
                  f" --batch_size to train on this dataset", file=sys.stderr)
        dt = time.time() - t0
        out = {"loss": _to_float(jnp.concatenate(losses).mean()) if losses
               else 0.0,
               "field_acc": np.asarray(jnp.concatenate(accs).mean(0))
               if accs else np.zeros(8),
               "tokens_per_sec": tokens / max(dt, 1e-9), "steps": n}
        if gnorms:  # pre-clip global gradient norm (observability, SURVEY §5)
            g = np.asarray(jnp.concatenate(gnorms))
            out["grad_norm_mean"] = float(g.mean())
            out["grad_norm_max"] = float(g.max())
        if self.lr_fn is not None:
            out["lr"] = float(self.lr_fn(int(self.state.step)))
        return out

    def _check_preempt(self) -> None:
        """Graceful shutdown: save the safety slot, then bail.  Resume
        restarts the interrupted epoch from it (CheckpointManager.restore
        prefers a pending safety save)."""
        if self.preempt is not None and self.preempt.requested:
            self.ckpt.save_safety(self.state, self._cur_epoch)
            raise Preempted(
                f"preempted at epoch {self._cur_epoch + 1}, optimizer step "
                f"{int(self.state.step)}: safety checkpoint saved under "
                f"{self.ckpt.directory}; rerun with --resume to continue")

    def valid_epoch(self) -> Dict[str, Any]:
        losses, accs = [], []
        eval_state = _eval_state(self.state)
        for bi, (batch, w) in enumerate(batch_iterator(
                self.valid_data, self.batch_size, self.np_rng, shuffle=False,
                drop_last=False)):
            # Distinct-but-deterministic corruption per validation batch:
            # self.rng alone would give sample i of EVERY batch the identical
            # corruption draw (only batch_size distinct patterns across the
            # whole split).  Folding the batch index keeps eval deterministic
            # across epochs while decorrelating batches.
            rng = jax.random.fold_in(self.rng, bi)
            if self.eval_step_fn is not None:
                m = self.eval_step_fn(eval_state, self.put_batch(batch),
                                      rng, jnp.asarray(w))
            else:
                m = pretrain_eval_step(eval_state, self.put_batch(batch),
                                       rng, jnp.asarray(w), self.cfg,
                                       self.mask_percent)
            losses.append(m["loss"])
            accs.append(m["field_acc"])
        return {"loss": _to_float(jnp.stack(losses).mean()) if losses else 0.0,
                "field_acc": np.asarray(jnp.stack(accs).mean(0)) if accs else
                np.zeros(8)}

    def run(self, epochs: int, resume: bool = False) -> TrainState:
        start_epoch = 0
        run_t0 = time.time()
        if resume:
            self.state, start_epoch = self.ckpt.restore(self.state)
            # without this, the first post-resume epoch always looked
            # "best" and overwrote a better best/ checkpoint
            self.best_acc = float(self.ckpt.meta().get("best_acc", -1.0))
        n_tok = np.asarray(self.cfg.field_sizes, dtype=np.float64)
        for epoch in range(start_epoch, epochs):
            self._cur_epoch = epoch
            # a signal that landed during the previous epoch's eval/save
            # stops here, before any work of this epoch is spent
            self._check_preempt()
            if self.bad_epochs >= self.patience:
                self.logger.epoch_line(
                    f"valid acc not improving for {self.patience} epochs")
                # structured marker: consumers (e.g. real_data_e2e's stage
                # cache) can tell a COMPLETED early-stopped run from an
                # interrupted one without re-training
                self.logger.log("early_stop", epoch=epoch,
                                patience=self.patience)
                break
            tr = self.train_epoch()
            va = self.valid_epoch()
            weighted = float((va["field_acc"] * n_tok).sum() / n_tok.sum())
            is_best = weighted > self.best_acc
            self.best_acc = max(weighted, self.best_acc)
            self.bad_epochs = 0 if is_best else self.bad_epochs + 1
            self.ckpt.save(epoch + 1, self.state,
                           {"weighted_acc": weighted, **va}, is_best)
            self.logger.log("epoch", epoch=epoch + 1, train=tr, valid=va,
                            weighted_acc=weighted, best=is_best)
            fmt = lambda a: [round(float(v), 3) for v in a]
            self.logger.epoch_line(
                f"Epoch {epoch + 1}: train_loss={tr['loss']:.4f}, "
                f"train_acc={fmt(tr['field_acc'])}, "
                f"valid_loss={va['loss']:.4f}, "
                f"valid_acc={fmt(va['field_acc'])}, "
                + (f"gnorm={tr['grad_norm_mean']:.3f}, "
                   if "grad_norm_mean" in tr else "")
                + (f"lr={tr['lr']:.2e}, " if "lr" in tr else "")
                + f"tok/s={tr['tokens_per_sec']:.0f}")
        # total wall-time report (main.py:94-100)
        self.logger.epoch_line(
            f"Time cost in pretrain is {time.time() - run_t0:.1f}s")
        return self.state


class SupervisedRunner:
    """Shared epoch loop for finetune/generation/ablation.

    ``step_fn(state, batch_tuple, rng, train) -> (state, metrics)`` where
    metrics carries loss and either acc_num/acc_den or field_acc.
    """

    def __init__(self, state: TrainState, cfg: PianoBartConfig, step_fn,
                 data, save_dir: str, batch_size: int = 8,
                 patience: int = 3, seed: int = 2023,
                 select: str = "scalar_acc",
                 eval_hook: Optional[Callable] = None,
                 put_batch: Callable = jnp.asarray,
                 lr_fn: Optional[Callable] = None,
                 preempt: Optional[PreemptionGuard] = None):
        self.lr_fn = lr_fn  # host-side LR mirror, logging only
        # graceful-shutdown flag, polled per train batch (see PretrainRunner)
        self.preempt = preempt
        self._cur_epoch = 0
        # put_batch shards inputs/labels/weights onto the mesh's dp axis
        # (parallel.mesh.put_batch_fn) — without it a multi-chip finetune
        # replicated every batch and computed it redundantly on every chip
        # (round-3 review)
        self.put_batch = put_batch
        self.state = state
        self.cfg = cfg
        self.step_fn = step_fn
        (self.X_train, self.X_val, self.X_test,
         self.y_train, self.y_val, self.y_test) = data
        self.save_dir = save_dir
        self.batch_size = batch_size
        self.patience = patience
        self.select = select
        self.eval_hook = eval_hook
        self.logger = MetricsLogger(save_dir)
        self.ckpt = CheckpointManager(save_dir)
        self.np_rng = np.random.default_rng(seed)
        self.rng = jax.random.PRNGKey(seed)
        self.best = -1.0
        self.bad = 0

    def _epoch(self, X, y, train: bool,
               collect_outputs: bool = False) -> Dict[str, Any]:
        losses = []
        acc_num = 0.0
        acc_den = 0.0
        field_accs = []
        gnorms = []
        extras = []
        outputs = []
        n = len(X)
        eval_state = None if train else _eval_state(self.state)
        idx = self.np_rng.permutation(n) if train else np.arange(n)
        # Every sample of the split is seen exactly once: the trailing short
        # batch is padded to one compiled shape with a zero sample-weight
        # (the reference's torch DataLoader keeps tail batches,
        # main.py:31-36; round 1 silently dropped up to batch_size-1
        # samples from every metric).
        for i in range(0, n, self.batch_size):
            sel = idx[i:i + self.batch_size]
            real = len(sel)
            weight = None
            if real < self.batch_size:
                pad = self.batch_size - real
                weight = self.put_batch(np.concatenate(
                    [np.ones(real, np.float32), np.zeros(pad, np.float32)]))
                sel = np.concatenate([sel, np.repeat(sel[:1], pad)])
            bx = self.put_batch(np.asarray(X[sel]).astype(np.int32))
            by = self.put_batch(np.asarray(y[sel]))
            if train:
                self.state, m = self.step_fn(self.state, bx, by, self.rng,
                                             train=True, weight=weight)
                self._check_preempt()
            else:
                # eval with the Polyak shadow when enabled; the returned
                # state is the (possibly params-swapped) input — discard it
                _, m = self.step_fn(eval_state, bx, by, self.rng,
                                    train=False, weight=weight)
            losses.append(m["loss"])
            if "acc_num" in m:
                acc_num += _to_float(m["acc_num"])
                acc_den += _to_float(m["acc_den"])
            if "field_acc" in m:
                field_accs.append(m["field_acc"])
            if "grad_norm" in m:
                gnorms.append(m["grad_norm"])
            if self.eval_hook is not None and not train:
                hm = dict(m)
                for k in ("outputs", "attn_dec", "pred"):
                    if k in hm:
                        hm[k] = np.asarray(hm[k])[:real]
                extras.append(self.eval_hook(np.asarray(bx)[:real],
                                             np.asarray(by)[:real], hm))
            if collect_outputs:
                key = "pred" if "pred" in m else "outputs"
                if key in m:
                    outputs.append(np.asarray(m[key])[:real])
        out: Dict[str, Any] = {
            "loss": _to_float(jnp.stack(losses).mean()) if losses else 0.0}
        if acc_den:
            out["acc"] = acc_num / acc_den
        if field_accs:
            out["field_acc"] = np.asarray(jnp.stack(field_accs).mean(0))
        if gnorms:
            g = np.asarray(jnp.stack(gnorms))
            out["grad_norm_mean"] = float(g.mean())
            out["grad_norm_max"] = float(g.max())
        if train and self.lr_fn is not None:
            out["lr"] = float(self.lr_fn(int(self.state.step)))
        if extras:
            keys = extras[0].keys()
            out.update({k: float(np.mean([e[k] for e in extras]))
                        for k in keys})
        if collect_outputs and outputs:
            out["outputs"] = np.concatenate(outputs, axis=0)
        return out

    def _check_preempt(self) -> None:
        """Graceful shutdown mid-epoch: safety-save + Preempted (see
        PretrainRunner._check_preempt; resume restarts this epoch)."""
        if self.preempt is not None and self.preempt.requested:
            self.ckpt.save_safety(self.state, self._cur_epoch)
            raise Preempted(
                f"preempted at epoch {self._cur_epoch + 1}, optimizer step "
                f"{int(self.state.step)}: safety checkpoint saved under "
                f"{self.ckpt.directory}; rerun with --resume to continue")

    def _selection_score(self, va: Dict[str, Any]) -> float:
        if self.select == "weighted_field_acc":
            n_tok = np.asarray(self.cfg.field_sizes, dtype=np.float64)
            return float((va["field_acc"] * n_tok).sum() / n_tok.sum())
        return float(va.get("acc", -va["loss"]))

    def run(self, epochs: int, resume: bool = False,
            run_test_each_epoch: bool = True) -> TrainState:
        start = 0
        if resume:
            self.state, start = self.ckpt.restore(self.state)
            self.best = float(self.ckpt.meta().get("best_acc", -1.0))
        for epoch in range(start, epochs):
            self._cur_epoch = epoch
            # signal that landed during the previous epoch's eval/save
            self._check_preempt()
            tr = self._epoch(self.X_train, self.y_train, train=True)
            va = self._epoch(self.X_val, self.y_val, train=False)
            te = (self._epoch(self.X_test, self.y_test, train=False,
                              collect_outputs=True)
                  if run_test_each_epoch else {})
            test_outputs = te.pop("outputs", None)
            if test_outputs is not None:
                # reference test() returns all_output for offline analysis
                # (finetune.py:148-150); persist it per epoch
                np.save(f"{self.save_dir}/test_outputs.npy", test_outputs)
            score = self._selection_score(va)
            # >= mirrors the reference exactly (main.py:191,399 use >=,
            # its pretrain loop uses strict >): a tied score refreshes the
            # best checkpoint and resets patience there too
            is_best = score >= self.best
            self.best = max(score, self.best)
            self.bad = 0 if is_best else self.bad + 1
            self.ckpt.save(epoch + 1, self.state, {"weighted_acc": score,
                                                   **va}, is_best)
            self.logger.log("epoch", epoch=epoch + 1, train=tr, valid=va,
                            test=te, score=score, best=is_best)
            self.logger.epoch_line(
                f"Epoch {epoch + 1}: train_loss={tr['loss']:.4f}, "
                f"valid_loss={va['loss']:.4f}, "
                + (f"gnorm={tr['grad_norm_mean']:.3f}, "
                   if "grad_norm_mean" in tr else "")
                + (f"lr={tr['lr']:.2e}, " if "lr" in tr else "")
                + (f"valid_acc={va.get('acc', float('nan')):.4f}, "
                   if "acc" in va else "")
                + (f"test_acc={te.get('acc', float('nan')):.4f}"
                   if "acc" in te else ""))
            if self.bad > self.patience:
                self.logger.epoch_line(
                    f"valid acc not improving for {self.patience} epochs")
                self.logger.log("early_stop", epoch=epoch + 1,
                                patience=self.patience)
                break
        return self.state
