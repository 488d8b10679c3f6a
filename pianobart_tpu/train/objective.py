"""Loss / metric primitives shared by all trainers.

Reproduces the reference's objectives on fused logits:

* per-field masked cross-entropy with vocab-size weighting
  (``pretrain.py:183-189``: ``total = Σ n_i·CE_i / Σ n_i``)
* optional extra per-field weights (generation finetune,
  ``finetune_generation.py:241-248``: Program/TimeSig/Tempo 0.3, Pitch 1.5)
* per-field masked accuracy (``pretrain.py:171-176``)

All functions are pure jnp, fp32 softmax, and guard empty masks (the
reference divides by zero when a corruption yields no masked position).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.config import PianoBartConfig
from ..models.heads import split_fields

#: Generation finetune per-field loss weights (finetune_generation.py:241-246).
GENERATION_FIELD_WEIGHTS: Tuple[float, ...] = (1, 1, 0.3, 1.5, 1, 1, 0.3, 0.3)


def masked_field_ce(
    fused_logits: jax.Array,          # (B, S, total_vocab)
    targets: jax.Array,               # (B, S, 8) int
    loss_mask: jax.Array,             # (B, S, 8) or (B, S)
    cfg: PianoBartConfig,
    field_weights: Optional[Sequence[float]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (weighted total loss, per-field losses (8,))."""
    if loss_mask.ndim == 2:
        loss_mask = loss_mask[..., None] * jnp.ones((1, 1, cfg.n_fields))
    fields = split_fields(fused_logits.astype(jnp.float32), cfg)
    losses = []
    for i in range(cfg.n_fields):
        logp = jax.nn.log_softmax(fields[i], axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., i:i + 1], axis=-1)[..., 0]
        m = loss_mask[..., i]
        denom = m.sum()
        li = jnp.where(denom > 0, (nll * m).sum() / jnp.maximum(denom, 1.0), 0.0)
        if field_weights is not None:
            li = li * field_weights[i]
        losses.append(li)
    losses = jnp.stack(losses)
    n_tok = jnp.asarray(cfg.field_sizes, dtype=jnp.float32)
    total = (losses * n_tok).sum() / n_tok.sum()
    return total, losses


def masked_field_accuracy(
    fused_logits: jax.Array,
    targets: jax.Array,
    loss_mask: jax.Array,
    cfg: PianoBartConfig,
) -> jax.Array:
    """Per-field accuracy on masked positions only; returns (8,)."""
    if loss_mask.ndim == 2:
        loss_mask = loss_mask[..., None] * jnp.ones((1, 1, cfg.n_fields))
    fields = split_fields(fused_logits, cfg)
    accs = []
    for i in range(cfg.n_fields):
        pred = fields[i].argmax(axis=-1)
        m = loss_mask[..., i]
        hit = ((pred == targets[..., i]) * m).sum()
        denom = m.sum()
        accs.append(jnp.where(denom > 0, hit / jnp.maximum(denom, 1.0), 0.0))
    return jnp.stack(accs)


def weighted_average_accuracy(accs: jax.Array, cfg: PianoBartConfig) -> jax.Array:
    """Vocab-size-weighted mean accuracy (model selection, main.py:72-74)."""
    n_tok = jnp.asarray(cfg.field_sizes, dtype=jnp.float32)
    return (accs * n_tok).sum() / n_tok.sum()


def shift_right(ids: jax.Array, sos_row: jax.Array) -> jax.Array:
    """Teacher-forcing decoder input: <SOS> + ids[:-1] (pretrain.py:132-139)."""
    B = ids.shape[0]
    sos = jnp.broadcast_to(sos_row.astype(ids.dtype), (B, 1) + ids.shape[2:])
    return jnp.concatenate([sos, ids[:, :-1]], axis=1)


def token_ce(
    logits: jax.Array,                # (B, S, C)
    targets: jax.Array,               # (B, S) int
    mask: jax.Array,                  # (B, S)
) -> jax.Array:
    """Pad-masked token-level CE (finetune.py:125-130)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def sequence_ce(logits: jax.Array, targets: jax.Array,
                weight: Optional[jax.Array] = None) -> jax.Array:
    """Mean sequence-level CE (finetune.py:131-132).

    ``weight`` (B,) zeroes padded samples in tail batches so every sample of
    a split contributes exactly once (torch DataLoader keeps tail batches,
    ``main.py:31-36``; one compiled shape here requires padding instead).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if weight is None:
        return nll.mean()
    return (nll * weight).sum() / jnp.maximum(weight.sum(), 1.0)
