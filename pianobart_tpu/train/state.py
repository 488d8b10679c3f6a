"""Train state + optimizer + checkpointing.

Optimizer matches the reference: AdamW(lr 2e-5, wd 0.01) with global-norm
gradient clipping at 3.0 (``pretrain.py:76, 192-196``).  Checkpointing uses
orbax with TRUE resume — the reference saves optimizer state every epoch but
never reloads it (SURVEY §5) — and keeps the reference's trunk-only vs
full-model duality plus a ``*_best`` pointer.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import optax
from flax import linen as nn
from flax.training import train_state

from ..models.config import PianoBartConfig


class TrainState(train_state.TrainState):
    """Standard flax TrainState; dropout rng folded in per step."""


def make_schedule(learning_rate: float, schedule: str = "constant",
                  warmup_steps: int = 0, decay_steps: Optional[int] = None):
    """LR schedule factory (beyond the reference's constant lr).

    ``constant`` (reference semantics, optionally with linear warmup),
    ``cosine``/``linear`` decay to 0 over ``decay_steps`` optimizer steps
    after ``warmup_steps`` of linear warmup.  Returns a float for the plain
    constant case so optimizer state stays scalar-free.
    """
    if schedule == "constant":
        if warmup_steps <= 0:
            return learning_rate
        return optax.linear_schedule(0.0, learning_rate, warmup_steps)
    if decay_steps is None or decay_steps <= warmup_steps:
        raise ValueError(
            f"schedule {schedule!r} needs decay_steps > warmup_steps "
            f"(got decay_steps={decay_steps}, warmup_steps={warmup_steps}); "
            f"set --decay_steps to the planned total optimizer steps")
    if schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, decay_steps)
    if schedule == "linear":
        warm = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
        decay = optax.linear_schedule(learning_rate, 0.0,
                                      decay_steps - warmup_steps)
        return optax.join_schedules([warm, decay], [warmup_steps])
    raise ValueError(f"unknown lr schedule {schedule!r}")


def make_optimizer(learning_rate: float = 2e-5, weight_decay: float = 0.01,
                   clip_norm: float = 3.0, *, schedule: str = "constant",
                   warmup_steps: int = 0, decay_steps: Optional[int] = None,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    """AdamW(lr, wd 0.01) + global-norm clip 3.0 (reference defaults).

    Beyond-reference knobs (all default to reference behavior):
    ``schedule``/``warmup_steps``/``decay_steps`` select an LR schedule
    (:func:`make_schedule`); ``accum_steps`` > 1 wraps the optimizer in
    ``optax.MultiSteps`` — gradients accumulate over k micro-batches and
    parameters update every k-th call, emulating a k-times-larger batch
    within one chip's memory (B=64 OOMs a v5e, ROADMAP.md)."""
    lr = make_schedule(learning_rate, schedule, warmup_steps, decay_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def create_train_state(model: nn.Module, cfg: PianoBartConfig, rng: jax.Array,
                       sample_args: tuple, learning_rate: float = 2e-5,
                       weight_decay: float = 0.01,
                       clip_norm: float = 3.0) -> TrainState:
    variables = model.init(rng, *sample_args)
    params = nn.meta.unbox(variables)["params"]
    tx = make_optimizer(learning_rate, weight_decay, clip_norm)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def load_merged_msgpack(path: str, params: Dict[str, Any]) -> Dict[str, Any]:
    """Graft a `pbx merge` output (.msgpack, flax serialization) onto
    ``params``, validating that at least one top-level key matches.

    Shared by ``cli._load_init_ckpt`` and ``serve.demo`` (the two copies had
    started to drift — round-2 advisor).
    """
    from flax import serialization
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    merged = dict(params)
    grafted = [k for k in tree if k in merged]
    if not grafted:
        raise SystemExit(
            f"{path} contains keys {sorted(tree)} but none match this "
            f"model's parameter tree {sorted(merged)} — wrong architecture "
            f"or not a `pbx merge` output")
    for k in grafted:
        merged[k] = tree[k]
    return merged


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------

class CheckpointManager:
    """Orbax-backed checkpoints with best-copy and resume.

    Layout under ``directory``:
      ``step_N/``      — full state (params + optimizer + epoch metadata)
      ``best/``        — copy of the best step (weighted-acc selection)
      ``safety/``      — rotating mid-epoch crash-safety save (one slot,
                         outside the ``step_N`` epoch namespace — a raw
                         optimizer step saved as ``step_N`` used to be
                         read back as an epoch index on resume, skipping
                         all remaining training)
      ``meta.json``    — {last_step, best_step, best_acc, history, safety?}
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    # -- meta -------------------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.directory, "meta.json")

    def _read_meta(self) -> Dict[str, Any]:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {"last_step": None, "best_step": None, "best_acc": -1.0,
                "history": []}

    def _write_meta(self, meta: Dict[str, Any]) -> None:
        with open(self._meta_path, "w") as f:
            json.dump(meta, f, indent=1)

    def meta(self) -> Dict[str, Any]:
        """Public read of meta.json (resume restores best_acc from here)."""
        return self._read_meta()

    # -- save/load ---------------------------------------------------------
    def save(self, step: int, state: TrainState, metrics: Dict[str, Any],
             is_best: bool) -> None:
        path = os.path.join(self.directory, f"step_{step}")
        if os.path.exists(path):
            shutil.rmtree(path)
        self.ckptr.save(path, {"params": state.params,
                               "opt_state": state.opt_state,
                               "step": np.asarray(state.step)})
        self.ckptr.wait_until_finished()
        meta = self._read_meta()
        meta["last_step"] = step
        meta["history"].append({"step": step, **{k: _jsonable(v)
                                                 for k, v in metrics.items()}})
        # an epoch-end save supersedes any mid-epoch safety slot
        if meta.pop("safety", None) is not None:
            shutil.rmtree(os.path.join(self.directory, "safety"),
                          ignore_errors=True)
        if is_best:
            best = os.path.join(self.directory, "best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
            meta["best_step"] = step
            meta["best_acc"] = _jsonable(metrics.get("weighted_acc", -1.0))
        self._write_meta(meta)
        self._gc()

    def _gc(self) -> None:
        meta = self._read_meta()
        steps = []
        for d in os.listdir(self.directory):
            # ignore (and sweep) orbax tmp dirs left by a killed process
            if d.endswith(".orbax-checkpoint-tmp"):
                shutil.rmtree(os.path.join(self.directory, d),
                              ignore_errors=True)
                continue
            if d.startswith("step_") and d.split("_", 1)[1].isdigit():
                steps.append(int(d.split("_", 1)[1]))
        for s in sorted(steps)[:-self.max_to_keep]:
            if s != meta.get("best_step"):
                shutil.rmtree(os.path.join(self.directory, f"step_{s}"),
                              ignore_errors=True)

    def save_safety(self, state: TrainState, epoch: int) -> None:
        """Mid-epoch crash-safety save into the single rotating ``safety``
        slot.  ``epoch`` is the 0-based epoch in progress: resume restarts
        that epoch with these params/optimizer."""
        path = os.path.join(self.directory, "safety")
        if os.path.exists(path):
            shutil.rmtree(path)
        self.ckptr.save(path, {"params": state.params,
                               "opt_state": state.opt_state,
                               "step": np.asarray(state.step)})
        self.ckptr.wait_until_finished()
        meta = self._read_meta()
        meta["safety"] = {"epoch": epoch, "opt_step": int(state.step)}
        self._write_meta(meta)

    def restore(self, state: TrainState, step: Optional[int] = None,
                best: bool = False) -> tuple[TrainState, int]:
        """Resume params AND optimizer state (the reference never did).

        Returns ``(state, start_epoch)``.  A pending mid-epoch safety save
        (newer than the last epoch-end save by construction — epoch-end
        saves clear it) wins: the interrupted epoch restarts from it."""
        meta = self._read_meta()
        if not best and step is None and meta.get("safety") is not None:
            path = os.path.join(self.directory, "safety")
            target = {"params": state.params, "opt_state": state.opt_state,
                      "step": np.asarray(state.step)}
            restored = self._restore_state(path, target)
            state = state.replace(params=restored["params"],
                                  opt_state=restored["opt_state"],
                                  step=int(restored["step"]))
            return state, int(meta["safety"]["epoch"])
        if best:
            path = os.path.join(self.directory, "best")
            step = meta.get("best_step") or 0
        else:
            step = step if step is not None else meta.get("last_step")
            if step is None:
                return state, 0
            path = os.path.join(self.directory, f"step_{step}")
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": np.asarray(state.step)}
        restored = self._restore_state(path, target)
        state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=int(restored["step"]))
        return state, int(step)

    def _restore_state(self, path: str, target):
        """Restore with a hint when the optimizer tree doesn't line up —
        the usual cause is resuming with different optimizer flags
        (--accum_steps wraps the state in optax.MultiSteps; schedules add
        a step count), which changes the opt_state STRUCTURE."""
        try:
            return self.ckptr.restore(path, target=target)
        except Exception as exc:
            msg = str(exc)
            if "opt_state" in msg or "structure" in msg.lower():
                raise type(exc)(
                    f"{msg}\n\nhint: the checkpoint's optimizer state does "
                    f"not match this run's optimizer. Resume with the SAME "
                    f"--accum_steps/--lr_schedule/--warmup_steps/"
                    f"--decay_steps the checkpoint was written with (params-"
                    f"only loading via --ckpt <dir> without --resume ignores "
                    f"optimizer state and always works).") from exc
            raise

    def restore_params(self, params, best: bool = True):
        """Load only model params (e.g. pretrain trunk into a finetune).

        Restores the raw checkpoint tree (no optimizer-state target needed)
        and grafts matching subtrees onto ``params``.  Accepts either a
        manager root (``.../name`` with ``meta.json`` + ``step_N``/``best``
        subdirs) or a checkpoint payload directly (``.../name/best``,
        ``.../name/step_7``) — users naturally pass both.
        """
        if os.path.exists(os.path.join(self.directory,
                                       "_CHECKPOINT_METADATA")):
            path = self.directory  # payload dir passed directly
        else:
            meta = self._read_meta()
            if best and meta.get("best_step") is not None:
                name = "best"
            elif meta.get("last_step") is not None:
                name = f"step_{meta['last_step']}"
            else:
                # a typo'd/empty directory used to fall through to
                # 'step_None' and die deep inside orbax
                raise FileNotFoundError(
                    f"no checkpoint found under {self.directory} — expected "
                    f"a manager root (meta.json + step_N/best subdirs) or a "
                    f"checkpoint payload dir (_CHECKPOINT_METADATA)")
            path = os.path.join(self.directory, name)
        restored = self.ckptr.restore(path)["params"]

        def graft(template, saved):
            if isinstance(template, dict):
                return {k: graft(v, saved[k]) if k in saved else v
                        for k, v in template.items()}
            arr = np.asarray(saved)
            assert arr.shape == np.asarray(template).shape, (
                f"checkpoint shape {arr.shape} != model {np.shape(template)}")
            return arr.astype(np.asarray(template).dtype)

        return graft(params, restored)


def _jsonable(v):
    if isinstance(v, (np.ndarray, jax.Array)):
        return np.asarray(v).tolist()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return v
