"""Understanding finetunes: composer/emotion (sequence) and melody/velocity
(token) classification.

Jitted equivalents of the reference ``FinetuneTrainer`` iteration
(``finetune.py:152-256``):

* sequence tasks: trunk fed the same ids on both sides through
  :class:`SequenceClassification` (model.py:204), mean CE, sequence accuracy;
* velocity: decoder consumes the right-shifted *label* stream through the
  swapped label embedding, pad id = ``class_num`` (finetune.py:193-198);
* melody: decoder consumes a copy of the encoder ids (finetune.py:209-213);
* optional L2 regularization ``weight * Σ‖θ‖₂`` (finetune.py:241-243 — note
  the reference sums unsquared L2 norms);
* accuracy masked by the encoder attention (finetune.py:222-230).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import vocab as V
from ..models.config import PianoBartConfig
from .objective import sequence_ce, token_ce
from .state import TrainState, get_grad_norm

_BAR_PAD = V.PAD[0]


def _l2_penalty(params) -> jax.Array:
    return sum(jnp.linalg.norm(p.astype(jnp.float32).reshape(-1))
               for p in jax.tree.leaves(params))


def _seq_loss(params, apply_fn, x, y, w, cfg, dropout_rng, deterministic,
              reg_weight):
    attn = (x[..., 0] != _BAR_PAD).astype(jnp.float32)
    rngs = None if deterministic else {"dropout": dropout_rng}
    logits = apply_fn({"params": params}, x, attn, deterministic, rngs=rngs)
    loss = sequence_ce(logits, y, w)
    if reg_weight is not None:
        loss = loss + reg_weight * _l2_penalty(params)
    return loss, logits


def _finetune_seq_step(state: TrainState, x: jax.Array, y: jax.Array,
                      rng: jax.Array, cfg: PianoBartConfig,
                      reg_weight: Optional[float] = None,
                      train: bool = True,
                      weight: Optional[jax.Array] = None,
                      ) -> Tuple[TrainState, Dict[str, Any]]:
    rng = jax.random.fold_in(rng, state.step)
    grad_norm = None
    if train:
        (loss, logits), grads = jax.value_and_grad(_seq_loss, has_aux=True)(
            state.params, state.apply_fn, x, y, weight, cfg, rng, False,
            reg_weight)
        state = state.apply_gradients(grads=grads)
        grad_norm = get_grad_norm(state.opt_state)  # logged clip: free
        if grad_norm is None:
            grad_norm = optax.global_norm(grads)
    else:
        loss, logits = _seq_loss(state.params, state.apply_fn, x, y, weight,
                                 cfg, rng, True, reg_weight)
    pred = logits.argmax(axis=-1)
    w = jnp.ones(y.shape[0]) if weight is None else weight
    metrics = {"loss": loss, "acc_num": ((pred == y) * w).sum(),
               "acc_den": w.sum(), "pred": pred}
    if grad_norm is not None:  # train is static: branch resolved at trace
        metrics["grad_norm"] = grad_norm
    return state, metrics


def _token_decoder_inputs(x, y, attn, cfg, velocity: bool):
    if velocity:
        # label right-shift with pad id = class_num (finetune.py:194-198)
        n_labels = cfg.decoder_label_vocab
        y_shift = jnp.concatenate(
            [jnp.full_like(y[:, :1], n_labels - 1), y[:, :-1]], axis=1)
        attn_shift = jnp.concatenate([attn[:, :1], attn[:, :-1]], axis=1)
        return y_shift, attn_shift
    return x, attn  # melody: decoder sees the encoder ids (finetune.py:209-213)


def _token_loss(params, apply_fn, x, y, w, cfg, velocity, dropout_rng,
                deterministic, reg_weight):
    attn = (x[..., 0] != _BAR_PAD).astype(jnp.float32)
    dec_ids, dec_attn = _token_decoder_inputs(x, y, attn, cfg, velocity)
    rngs = None if deterministic else {"dropout": dropout_rng}
    logits = apply_fn({"params": params}, x, dec_ids, attn, dec_attn,
                      deterministic, rngs=rngs)
    loss_mask = attn if w is None else attn * w[:, None]
    loss = token_ce(logits, y, loss_mask)
    if reg_weight is not None:
        loss = loss + reg_weight * _l2_penalty(params)
    return loss, (logits, loss_mask)


def _finetune_token_step(state: TrainState, x: jax.Array, y: jax.Array,
                        rng: jax.Array, cfg: PianoBartConfig,
                        velocity: bool = False,
                        reg_weight: Optional[float] = None,
                        train: bool = True,
                        weight: Optional[jax.Array] = None,
                        ) -> Tuple[TrainState, Dict[str, Any]]:
    rng = jax.random.fold_in(rng, state.step)
    grad_norm = None
    if train:
        (loss, (logits, loss_mask)), grads = jax.value_and_grad(
            _token_loss, has_aux=True)(
            state.params, state.apply_fn, x, y, weight, cfg, velocity, rng,
            False, reg_weight)
        state = state.apply_gradients(grads=grads)
        grad_norm = get_grad_norm(state.opt_state)
        if grad_norm is None:
            grad_norm = optax.global_norm(grads)
    else:
        loss, (logits, loss_mask) = _token_loss(
            state.params, state.apply_fn, x, y, weight, cfg, velocity, rng,
            True, reg_weight)
    pred = logits.argmax(axis=-1)
    metrics = {"loss": loss,
               "acc_num": ((pred == y) * loss_mask).sum(),
               "acc_den": loss_mask.sum(), "pred": pred}
    if grad_norm is not None:
        metrics["grad_norm"] = grad_norm
    return state, metrics

# Donation is train-only: an eval call (train=False) must not invalidate
# the caller's state buffers on TPU — mirroring pretrain_eval_step, which
# deliberately omits donation (round-3 review; donation is a no-op on CPU,
# so tests could never catch a donated eval state).
_seq_train = functools.partial(jax.jit, static_argnames=(
    "cfg", "reg_weight", "train"), donate_argnums=(0,))(_finetune_seq_step)
_seq_eval = functools.partial(jax.jit, static_argnames=(
    "cfg", "reg_weight", "train"))(_finetune_seq_step)
_token_train = functools.partial(jax.jit, static_argnames=(
    "cfg", "velocity", "reg_weight", "train"),
    donate_argnums=(0,))(_finetune_token_step)
_token_eval = functools.partial(jax.jit, static_argnames=(
    "cfg", "velocity", "reg_weight", "train"))(_finetune_token_step)


def finetune_seq_step(state, x, y, rng, cfg, reg_weight=None, train=True,
                      weight=None):
    f = _seq_train if train else _seq_eval
    return f(state, x, y, rng, cfg=cfg, reg_weight=reg_weight, train=train,
             weight=weight)


def finetune_token_step(state, x, y, rng, cfg, velocity=False,
                        reg_weight=None, train=True, weight=None):
    f = _token_train if train else _token_eval
    return f(state, x, y, rng, cfg=cfg, velocity=velocity,
             reg_weight=reg_weight, train=train, weight=weight)
