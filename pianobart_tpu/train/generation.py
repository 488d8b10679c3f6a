"""Generation finetune + no-pretrain ablation objectives.

* :func:`generation_step` — seq2seq finetune on (intro, continuation) pairs
  (reference ``GenerationTrainer.iteration``, finetune_generation.py:118-272).
  Teacher forcing uses the *intro* as decoder input (``y_shift = x``,
  finetune_generation.py:155 — reproduced faithfully; the cleaned reference
  variant uses a proper right-shifted target instead, which is available via
  ``decoder_mode="shifted"``).  Per-field CE with vocab-size weighting and
  field weights {Program,TimeSig,Tempo}=0.3, Pitch=1.5.

* :func:`ablation_step` — "continuation without pretraining" ablation
  (``Ablation.py:105-257``): zero the second half of each sequence on the
  encoder side, train the decoder to reconstruct it; loss masked to the
  reconstructed half.  (The reference's field-weight loop is buggy — it
  applies the *last* field's 0.3 to every field; we use the generation
  weights, which is the evident intent.)

FAD metrics are host-side (:mod:`pianobart_tpu.utils.fad`) and computed by
the runner on eval batches, not inside the jitted step.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import vocab as V
from ..models.config import PianoBartConfig
from ..ops.sampling import greedy_octuple
from .state import get_grad_norm
from .objective import (GENERATION_FIELD_WEIGHTS, masked_field_accuracy,
                        masked_field_ce, shift_right)
from .state import TrainState

_BAR_PAD = V.PAD[0]
_SOS_ROW = jnp.asarray(V.SOS, dtype=jnp.int32)


def _gen_loss(params, apply_fn, x, y, w, cfg, decoder_mode, dropout_rng,
              deterministic):
    attn_enc = (x[..., 0] != _BAR_PAD).astype(jnp.float32)
    if decoder_mode == "intro":
        dec_ids = x                       # finetune_generation.py:155
    else:
        dec_ids = shift_right(y, _SOS_ROW)  # clear-code train_generate.py
    attn_dec = (dec_ids[..., 0] != _BAR_PAD).astype(jnp.float32)
    loss_mask = attn_dec if w is None else attn_dec * w[:, None]
    rngs = None if deterministic else {"dropout": dropout_rng}
    fused = apply_fn({"params": params}, x, dec_ids, attn_enc, attn_dec,
                     deterministic, rngs=rngs)
    loss, per_field = masked_field_ce(fused, y, loss_mask, cfg,
                                      GENERATION_FIELD_WEIGHTS)
    return loss, (fused, per_field, attn_dec, loss_mask)


def _generation_step(state: TrainState, x: jax.Array, y: jax.Array,
                     rng: jax.Array, cfg: PianoBartConfig,
                     decoder_mode: str = "intro",
                     train: bool = True,
                     weight: Optional[jax.Array] = None,
                     ) -> Tuple[TrainState, Dict[str, Any]]:
    rng = jax.random.fold_in(rng, state.step)
    grad_norm = None
    if train:
        (loss, aux), grads = jax.value_and_grad(_gen_loss, has_aux=True)(
            state.params, state.apply_fn, x, y, weight, cfg, decoder_mode,
            rng, False)
        state = state.apply_gradients(grads=grads)
        grad_norm = get_grad_norm(state.opt_state)  # logged clip: free
        if grad_norm is None:
            grad_norm = optax.global_norm(grads)
    else:
        loss, aux = _gen_loss(state.params, state.apply_fn, x, y, weight,
                              cfg, decoder_mode, rng, True)
    fused, per_field, attn_dec, loss_mask = aux
    accs = masked_field_accuracy(fused, y, loss_mask, cfg)
    outputs = greedy_octuple(fused, cfg)
    metrics = {"loss": loss, "field_loss": per_field, "field_acc": accs,
               "outputs": outputs, "attn_dec": attn_dec}
    if grad_norm is not None:  # train is static: resolved at trace time
        metrics["grad_norm"] = grad_norm
    return state, metrics


# Donation is train-only, mirroring train/finetune.py: an eval call
# (train=False) returns the state unchanged, and a caller that keeps using
# its original state reference after a donated eval would hit deleted
# buffers on TPU (donation is a no-op on CPU, so tests can't catch it).
_gen_train = functools.partial(jax.jit, static_argnames=(
    "cfg", "decoder_mode", "train"), donate_argnums=(0,))(_generation_step)
_gen_eval = functools.partial(jax.jit, static_argnames=(
    "cfg", "decoder_mode", "train"))(_generation_step)


def generation_step(state, x, y, rng, cfg, decoder_mode="intro", train=True,
                    weight=None):
    f = _gen_train if train else _gen_eval
    return f(state, x, y, rng, cfg=cfg, decoder_mode=decoder_mode,
             train=train, weight=weight)


def _ablation_prepare(batch: jax.Array):
    """Zero second half of encoder input; the loss span reproduces the
    reference EXACTLY (``Ablation.py:137``:
    ``loss_mask[i, length//2+1 : length+1] = 1``) — including its
    1-indexing artifact: position ``length//2`` (zeroed on the encoder) is
    excluded and position ``length`` (the first PAD row) is included."""
    S = batch.shape[1]
    label = batch
    dec_ids = shift_right(batch, _SOS_ROW)
    length = (batch[..., 0] != _BAR_PAD).sum(axis=1)          # (B,)
    half = length // 2
    pos = jnp.arange(S)[None, :]
    enc_ids = jnp.where((pos >= half[:, None])[..., None],
                        jnp.asarray(V.PAD, batch.dtype)[None, None, :], batch)
    loss_mask = ((pos >= (half + 1)[:, None]) &
                 (pos <= length[:, None])).astype(jnp.float32)
    return enc_ids, dec_ids, label, loss_mask


def _ablation_loss(params, apply_fn, batch, w, cfg, dropout_rng,
                   deterministic):
    enc_ids, dec_ids, label, loss_mask = _ablation_prepare(batch)
    if w is not None:
        loss_mask = loss_mask * w[:, None]
    attn_enc = (enc_ids[..., 0] != _BAR_PAD).astype(jnp.float32)
    attn_dec = (dec_ids[..., 0] != _BAR_PAD).astype(jnp.float32)
    rngs = None if deterministic else {"dropout": dropout_rng}
    fused = apply_fn({"params": params}, enc_ids, dec_ids, attn_enc, attn_dec,
                     deterministic, rngs=rngs)
    loss, per_field = masked_field_ce(fused, label, loss_mask, cfg,
                                      GENERATION_FIELD_WEIGHTS)
    return loss, (fused, per_field, loss_mask)


def _ablation_step(state: TrainState, batch: jax.Array, rng: jax.Array,
                   cfg: PianoBartConfig,
                   train: bool = True,
                   weight: Optional[jax.Array] = None,
                   ) -> Tuple[TrainState, Dict[str, Any]]:
    rng = jax.random.fold_in(rng, state.step)
    grad_norm = None
    if train:
        (loss, aux), grads = jax.value_and_grad(_ablation_loss, has_aux=True)(
            state.params, state.apply_fn, batch, weight, cfg, rng, False)
        state = state.apply_gradients(grads=grads)
        grad_norm = get_grad_norm(state.opt_state)
        if grad_norm is None:
            grad_norm = optax.global_norm(grads)
    else:
        loss, aux = _ablation_loss(state.params, state.apply_fn, batch,
                                   weight, cfg, rng, True)
    fused, per_field, loss_mask = aux
    accs = masked_field_accuracy(fused, batch, loss_mask, cfg)
    metrics = {"loss": loss, "field_loss": per_field, "field_acc": accs,
               "outputs": greedy_octuple(fused, cfg), "loss_mask": loss_mask}
    if grad_norm is not None:
        metrics["grad_norm"] = grad_norm
    return state, metrics


_abl_train = functools.partial(jax.jit, static_argnames=(
    "cfg", "train"), donate_argnums=(0,))(_ablation_step)
_abl_eval = functools.partial(jax.jit, static_argnames=(
    "cfg", "train"))(_ablation_step)


def ablation_step(state, batch, rng, cfg, train=True, weight=None):
    f = _abl_train if train else _abl_eval
    return f(state, batch, rng, cfg=cfg, train=train, weight=weight)
