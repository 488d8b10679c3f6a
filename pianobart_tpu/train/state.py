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
from typing import Any, Dict, NamedTuple, Optional

import jax
import numpy as np
import optax
from flax import linen as nn
from flax.training import train_state

from ..models.config import PianoBartConfig


class TrainState(train_state.TrainState):
    """Standard flax TrainState; dropout rng folded in per step."""


class ClipNormState(NamedTuple):
    """State of :func:`clip_by_global_norm_logged`: the pre-clip global
    gradient norm of the most recent (real) update."""
    grad_norm: jax.Array


def clip_by_global_norm_logged(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` that RECORDS the norm it computes.

    Bitwise-identical update math (same trigger/select formulation as
    optax._src.clipping.clip_by_global_norm); the only difference is that
    the global norm — which the clip has to compute anyway — is kept in the
    transform state, so train steps can report it for free instead of
    recomputing it (a second ``optax.global_norm`` over 170M-param grads
    measured ~2 ms/step on v5e — XLA does not CSE it across the scan/donation
    boundaries).  Read it back with :func:`get_grad_norm`.
    """
    import jax.numpy as jnp

    def init(params):
        del params
        return ClipNormState(grad_norm=jnp.zeros((), jnp.float32))

    def update(updates, state, params=None):
        del params, state
        g_norm = optax.global_norm(updates)
        trigger = jnp.squeeze(g_norm < max_norm)

        def clip_fn(t):
            return jax.lax.select(trigger, t,
                                  (t / g_norm.astype(t.dtype)) * max_norm)

        return (jax.tree.map(clip_fn, updates),
                ClipNormState(grad_norm=g_norm.astype(jnp.float32)))

    return optax.GradientTransformation(init, update)


def get_grad_norm(opt_state):
    """Pre-clip global grad norm of the last update, or None.

    Walks nested optimizer states (chain tuples, MultiSteps inner state)
    for :class:`ClipNormState`.  Under ``--accum_steps`` the inner clip only
    runs on real updates, so micro-steps report the last real update's norm.
    """
    found = _find_state(opt_state, ClipNormState)
    return None if found is None else found.grad_norm


class EmaState(NamedTuple):
    """Shadow parameter average for :func:`params_ema`."""
    ema: Any


def params_ema(decay: float) -> optax.GradientTransformation:
    """Exponential moving average of the *parameters* (Polyak averaging).

    Placed LAST in the optimizer chain: at that point ``updates`` is the
    final delta ``apply_gradients`` will add, so ``params + updates`` is the
    post-step parameter value and the shadow tracks it with
    ``ema = decay*ema + (1-decay)*new_params``.  The shadow initializes to
    the initial params (no zero-init bias), updates pass through unchanged,
    and the copy lives in ``opt_state`` so it checkpoints/restores for
    free.  Evaluating/exporting with EMA weights is standard large-run
    practice the reference lacks; retrieval is :func:`get_ema_params`.
    """
    def init(params):
        # a REAL copy, not an aliasing identity map: the shadow must live in
        # its own buffers, or the first donated train step dies with
        # "attempt to donate the same buffer twice" (params and ema would
        # flatten to the same jax.Array)
        import jax.numpy as jnp
        return EmaState(ema=jax.tree.map(jnp.copy, params))

    def update(updates, state, params=None):
        assert params is not None, "params_ema needs params in the chain"
        new_ema = jax.tree.map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates)
        return updates, EmaState(ema=new_ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state, params=None):
    """Extract EMA params from an optimizer state.

    Walks nested optimizer states (tuples from ``optax.chain``,
    ``MultiSteps.inner_opt_state``) looking for :class:`EmaState`; returns
    ``params`` unchanged when no EMA transform is present — convenient for
    "eval with EMA if enabled" call sites.
    """
    found = _find_state(opt_state, EmaState)
    return params if found is None else found.ema


def _find_state(node, kind):
    if isinstance(node, kind):
        return node
    if hasattr(node, "inner_opt_state"):      # optax.MultiSteps
        return _find_state(node.inner_opt_state, kind)
    if isinstance(node, (tuple, list)):
        for item in node:
            got = _find_state(item, kind)
            if got is not None:
                return got
    return None


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
                   accum_steps: int = 1,
                   ema_decay: Optional[float] = None,
                   ) -> optax.GradientTransformation:
    """AdamW(lr, wd 0.01) + global-norm clip 3.0 (reference defaults).

    Beyond-reference knobs (all default to reference behavior):
    ``schedule``/``warmup_steps``/``decay_steps`` select an LR schedule
    (:func:`make_schedule`); ``accum_steps`` > 1 wraps the optimizer in
    ``optax.MultiSteps`` — gradients accumulate over k micro-batches and
    parameters update every k-th call, emulating a k-times-larger batch
    within one chip's memory (B=64 OOMs a v5e, ROADMAP.md); ``ema_decay``
    keeps a Polyak shadow average of the params (:func:`params_ema`) that
    the runners evaluate/select-best with (EMA advances once per real
    update, i.e. every ``accum_steps`` micro-batches)."""
    lr = make_schedule(learning_rate, schedule, warmup_steps, decay_steps)
    parts = [
        clip_by_global_norm_logged(clip_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    ]
    if ema_decay is not None:
        if not (0.0 < ema_decay < 1.0):
            raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
        parts.append(params_ema(ema_decay))
    tx = optax.chain(*parts)
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
                    f"--decay_steps/--ema_decay the checkpoint was written "
                    f"with (params-"
                    f"only loading via --ckpt <dir> without --resume ignores "
                    f"optimizer state and always works).") from exc
            raise

    def restore_ema_params(self, params, best: bool = True):
        """Load the Polyak shadow average saved inside ``opt_state`` (runs
        trained with ``--ema_decay``) and graft it onto ``params``.

        The raw orbax restore loses the optax NamedTuple types, so the
        :class:`EmaState` shows up as a dict with an ``"ema"`` key — found
        by walking the opt_state tree."""
        path = self._payload_path(best)
        restored = self._raw_restore(path)

        def find_ema(node):
            if isinstance(node, dict):
                if "ema" in node and isinstance(node["ema"], dict):
                    return node["ema"]
                for v in node.values():
                    got = find_ema(v)
                    if got is not None:
                        return got
            elif isinstance(node, (list, tuple)):
                for v in node:
                    got = find_ema(v)
                    if got is not None:
                        return got
            return None

        ema = find_ema(restored.get("opt_state"))
        if ema is None:
            raise FileNotFoundError(
                f"{path} has no EMA shadow in its optimizer state — the run "
                f"was not trained with --ema_decay")
        return self._graft(params, ema)

    def _raw_restore(self, path: str):
        """Target-less restore as PLAIN numpy arrays.

        ``StandardCheckpointer.restore(path)`` without a target rebuilds the
        jax.Arrays with the SAVED shardings — which fails outright when the
        restoring process has a different device topology (e.g. exporting a
        mesh-trained checkpoint from a single-host process: "available
        devices are different from the devices used to save").  Forcing
        ``RestoreArgs(restore_type=np.ndarray)`` on every leaf sidesteps
        device placement entirely.
        """
        import pathlib
        from orbax.checkpoint._src.handlers import (
            pytree_checkpoint_handler as _pch)
        ocp = self._ocp
        p = pathlib.Path(path).resolve()
        handler = _pch.PyTreeCheckpointHandler()
        skeleton = handler.metadata(p)
        skeleton = getattr(skeleton, "tree", skeleton)
        leaves, treedef = jax.tree_util.tree_flatten(skeleton)
        restore_args = jax.tree_util.tree_unflatten(
            treedef,
            [ocp.RestoreArgs(restore_type=np.ndarray) for _ in leaves])
        return handler.restore(
            p, args=ocp.args.PyTreeRestore(restore_args=restore_args))

    def _payload_path(self, best: bool) -> str:
        """Resolve a manager root (or direct payload dir) to a payload."""
        if os.path.exists(os.path.join(self.directory,
                                       "_CHECKPOINT_METADATA")):
            return self.directory
        meta = self._read_meta()
        if best and meta.get("best_step") is not None:
            return os.path.join(self.directory, "best")
        if meta.get("last_step") is not None:
            return os.path.join(self.directory, f"step_{meta['last_step']}")
        raise FileNotFoundError(
            f"no checkpoint found under {self.directory} — expected a "
            f"manager root (meta.json + step_N/best subdirs) or a "
            f"checkpoint payload dir (_CHECKPOINT_METADATA)")

    @staticmethod
    def _graft(template, saved):
        if isinstance(template, dict):
            return {k: CheckpointManager._graft(v, saved[k]) if k in saved
                    else v for k, v in template.items()}
        # template may be a concrete array OR a jax.ShapeDtypeStruct (the
        # inference loader builds its skeleton with jax.eval_shape so that
        # restoring never compiles/runs a real model.init)
        arr = np.asarray(saved)
        tshape = tuple(getattr(template, "shape", np.shape(template)))
        tdtype = np.dtype(getattr(template, "dtype",
                                  np.asarray(template).dtype))
        assert arr.shape == tshape, (
            f"checkpoint shape {arr.shape} != model {tshape}")
        return arr.astype(tdtype)

    def restore_params(self, params, best: bool = True):
        """Load only model params (e.g. pretrain trunk into a finetune).

        Restores the raw checkpoint tree (no optimizer-state target needed)
        and grafts matching subtrees onto ``params``.  Accepts either a
        manager root (``.../name`` with ``meta.json`` + ``step_N``/``best``
        subdirs) or a checkpoint payload directly (``.../name/best``,
        ``.../name/step_7``) — users naturally pass both.  A typo'd/empty
        directory raises FileNotFoundError instead of dying deep inside
        orbax on ``step_None``.
        """
        restored = self._raw_restore(self._payload_path(best))["params"]
        return self._graft(params, restored)


def _jsonable(v):
    if isinstance(v, (np.ndarray, jax.Array)):
        return np.asarray(v).tolist()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return v
