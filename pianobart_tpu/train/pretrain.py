"""Pretraining: BART denoising over Octuple streams.

TPU-native replacement for the reference ``Pretrainer``
(``pretrain.py:51-209``).  Differences by design:

* the per-sample host-side ``gen_mask`` Python loop (the reference's CPU hot
  spot, ``pretrain.py:131-144``) becomes on-device vectorized corruption
  (:func:`pianobart_tpu.ops.noise.corrupt_batch`) fused into ONE jitted,
  mesh-sharded train step;
* accuracy is computed on device (the reference argmax'es on host numpy
  every step, ``pretrain.py:164-168``);
* batches are sharded over the ``dp`` mesh axis; XLA inserts the gradient
  all-reduce;
* dropout masks are drawn from the hardware-friendly ``unsafe_rbg``
  generator (threefry mask generation costs ~60 ms/step at B=16 on v5e;
  corruption keeps threefry — Poisson sampling requires it).

Objective parity: decoder input = right-shifted *clean* sequence with
``<SOS>`` (pretrain.py:132-139); encoder input = corrupted sequence;
loss = vocab-size-weighted masked CE against the clean sequence; AdamW
(lr 2e-5, wd 0.01) + clip 3.0.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import vocab as V
from ..models.config import PianoBartConfig
from ..ops.noise import corrupt_batch
from .objective import (masked_field_accuracy, masked_field_ce, shift_right,
                        weighted_average_accuracy)
from .state import TrainState, get_grad_norm

_SOS_ROW = jnp.asarray(V.SOS, dtype=jnp.int32)
_BAR_PAD = V.PAD[0]


def _fast_dropout_key(key: jax.Array) -> jax.Array:
    """Reseed the dropout stream onto the fast rbg generator."""
    seed = jax.random.bits(key, dtype=jnp.uint32)
    return jax.random.key(seed, impl="unsafe_rbg")


def _forward_loss(params, apply_fn, batch, corrupted, loss_mask, cfg,
                  dropout_rng, deterministic):
    decoder_ids = shift_right(batch, _SOS_ROW)
    enc_mask = (corrupted[..., 0] != _BAR_PAD).astype(jnp.float32)
    dec_mask = (decoder_ids[..., 0] != _BAR_PAD).astype(jnp.float32)
    rngs = None if deterministic else {"dropout": dropout_rng}
    fused = apply_fn({"params": params}, corrupted, decoder_ids,
                     enc_mask, dec_mask, deterministic, rngs=rngs)
    total, per_field = masked_field_ce(fused, batch, loss_mask, cfg)
    return total, (fused, per_field)


@functools.partial(jax.jit, static_argnames=("cfg", "mask_percent"),
                   donate_argnums=(0,))
def pretrain_step(state: TrainState, batch: jax.Array, rng: jax.Array,
                  cfg: PianoBartConfig,
                  mask_percent: float = 0.15) -> Tuple[TrainState, Dict[str, Any]]:
    """One fused train step: corrupt -> forward -> loss -> grads -> update."""
    rng_corrupt, rng_dropout = jax.random.split(jax.random.fold_in(rng, state.step))
    rng_dropout = _fast_dropout_key(rng_dropout)
    corrupted, loss_mask = corrupt_batch(rng_corrupt, batch, mask_percent)

    grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
    (total, (fused, per_field)), grads = grad_fn(
        state.params, state.apply_fn, batch, corrupted, loss_mask, cfg,
        rng_dropout, False)
    state = state.apply_gradients(grads=grads)
    # pre-clip global grad norm, read from the logged clip transform
    # (clip_by_global_norm_logged): FREE — a second optax.global_norm here
    # measured ~2 ms/step on v5e (XLA didn't CSE it with the clip's own)
    grad_norm = get_grad_norm(state.opt_state)
    if grad_norm is None:  # custom optimizer without the logged clip
        grad_norm = optax.global_norm(grads)

    accs = masked_field_accuracy(fused, batch, loss_mask, cfg)
    metrics = {"loss": total, "field_loss": per_field, "field_acc": accs,
               "weighted_acc": weighted_average_accuracy(accs, cfg),
               "grad_norm": grad_norm,
               "tokens": jnp.asarray(batch.shape[0] * batch.shape[1])}
    return state, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "mask_percent"))
def pretrain_eval_step(state: TrainState, batch: jax.Array, rng: jax.Array,
                       sample_weight: jax.Array, cfg: PianoBartConfig,
                       mask_percent: float = 0.15) -> Dict[str, Any]:
    """Validation step (no update); ``sample_weight`` zeroes padded rows."""
    rng_corrupt, _ = jax.random.split(rng)
    corrupted, loss_mask = corrupt_batch(rng_corrupt, batch, mask_percent)
    loss_mask = loss_mask * sample_weight[:, None, None]
    total, (fused, per_field) = _forward_loss(
        state.params, state.apply_fn, batch, corrupted, loss_mask, cfg,
        None, True)
    accs = masked_field_accuracy(fused, batch, loss_mask, cfg)
    return {"loss": total, "field_loss": per_field, "field_acc": accs,
            "weighted_acc": weighted_average_accuracy(accs, cfg)}


@functools.partial(jax.jit, static_argnames=("cfg", "mask_percent", "n_steps"),
                   donate_argnums=(0,))
def pretrain_multi_step(state: TrainState, batch: jax.Array, rng: jax.Array,
                        cfg: PianoBartConfig, mask_percent: float = 0.15,
                        n_steps: int = 10):
    """K fused train steps in ONE dispatch: a single device program, one
    host round trip (the tunnel costs ~25 ms per dispatch).

    ``batch`` is either ``(B, S, 8)`` (reused every step — benchmarks) or
    ``(K, B, S, 8)`` (one batch per step — training).  Returns
    (state, (losses (K,), field_accs (K, 8), grad_norms (K,))).
    """
    if batch.ndim == 3:
        batch = jnp.broadcast_to(batch, (n_steps,) + batch.shape)
    assert batch.shape[0] == n_steps

    def body(state_rng, b):
        state, rng = state_rng
        rng, sub = jax.random.split(rng)
        rc, rd = jax.random.split(jax.random.fold_in(sub, state.step))
        rd = _fast_dropout_key(rd)
        corrupted, loss_mask = corrupt_batch(rc, b, mask_percent)
        grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
        (total, (fused, _)), grads = grad_fn(
            state.params, state.apply_fn, b, corrupted, loss_mask, cfg,
            rd, False)
        state = state.apply_gradients(grads=grads)
        grad_norm = get_grad_norm(state.opt_state)
        if grad_norm is None:
            grad_norm = optax.global_norm(grads)
        accs = masked_field_accuracy(fused, b, loss_mask, cfg)
        return (state, rng), (total, accs, grad_norm)

    (state, _), (losses, accs, gnorms) = jax.lax.scan(body, (state, rng),
                                                      batch)
    return state, (losses, accs, gnorms)


def batch_iterator(data: np.ndarray, batch_size: int, rng: np.random.Generator,
                   shuffle: bool = True, drop_last: bool = True,
                   ) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
    """Yields (batch, sample_weight); pads the trailing batch when kept."""
    n = len(data)
    idx = rng.permutation(n) if shuffle else np.arange(n)
    stop = (n // batch_size) * batch_size
    for i in range(0, stop, batch_size):
        sel = idx[i:i + batch_size]
        yield data[sel], np.ones(batch_size, dtype=np.float32)
    if not drop_last and stop < n:
        sel = idx[stop:]
        pad = batch_size - len(sel)
        batch = np.concatenate([data[sel], np.tile(data[sel[:1]], (pad, 1, 1))])
        weight = np.concatenate([np.ones(len(sel), np.float32),
                                 np.zeros(pad, np.float32)])
        yield batch, weight
