"""On-device adaptive sampling.

Reimplements the reference "Adaptive Sampling Policy" (CP-Transformer style,
``model.py:68-107``): per-field temperature + nucleus (top-p) sampling with

    t = [1.2, 1.2, 5, 1, 2, 5, 5, 1.2]
    p = [1,   1,   1, .9, .9, 1, 1, .9]

The reference runs this on host numpy per decode step (D2H sync every token);
here it is pure jnp, jit-able inside the decode loop.

Semantics note (verified against the reference nucleus code): with ``p = 1``
the cumulative sum never *strictly exceeds* p, so the reference falls back to
``sorted_index[0:1]`` — i.e. p=1 fields decode greedily.  We reproduce that.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.config import PianoBartConfig
from ..models.heads import split_fields

#: Reference per-field temperature / top-p (model.py:70-71).
DEFAULT_TEMPERATURE: Tuple[float, ...] = (1.2, 1.2, 5.0, 1.0, 2.0, 5.0, 5.0, 1.2)
DEFAULT_TOP_P: Tuple[float, ...] = (1.0, 1.0, 1.0, 0.9, 0.9, 1.0, 1.0, 0.9)


def _nucleus_core(rng: jax.Array, logits: jax.Array, top_p: jax.Array,
                  temperature: jax.Array) -> jax.Array:
    """Nucleus sampling over the last axis of (..., V) f32 logits.

    ``top_p``/``temperature`` broadcast against the leading axes.  ONE
    implementation serves both the scalar per-field path and the vectorized
    (B, 8, Vmax) decode path.
    """
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    # Renormalize with the reference's +1e-5 slack (model.py:85): keeps the
    # cumulative sum strictly below 1 so p=1.0 selects exactly the top-1.
    probs = probs / (probs.sum(axis=-1, keepdims=True) + 1e-5)
    order = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    csum = jnp.cumsum(sorted_probs, axis=-1)
    exceeded = csum > top_p
    any_exceeded = exceeded.any(axis=-1, keepdims=True)
    # last_index = first exceeding position + 1; if none exceeded keep top-1
    # (reference nucleus(), model.py:84-98).
    first_exceed = jnp.argmax(exceeded, axis=-1, keepdims=True)
    last_index = jnp.where(any_exceeded, first_exceed + 1, 1)
    shape = [1] * (logits.ndim - 1) + [logits.shape[-1]]
    ranks = jnp.arange(logits.shape[-1]).reshape(shape)
    keep = ranks < last_index
    masked = jnp.where(keep, sorted_probs, 0.0)
    # categorical over the renormalized candidate set (Gumbel-max on logs)
    logp = jnp.log(jnp.maximum(masked, 1e-38)) + jnp.where(keep, 0.0, -1e9)
    choice = jax.random.categorical(rng, logp, axis=-1)
    return jnp.take_along_axis(order, choice[..., None], axis=-1)[..., 0]


def nucleus_sample(rng: jax.Array, logits: jax.Array, top_p: float,
                   temperature: float) -> jax.Array:
    """Sample one token id per row from (B, V) logits."""
    return _nucleus_core(rng, logits.astype(jnp.float32),
                         jnp.float32(top_p), jnp.float32(temperature))


def sample_octuple(
    rng: jax.Array,
    fused_logits: jax.Array,                 # (B, total_vocab) — one position
    cfg: PianoBartConfig,
    temperature: Sequence[float] = DEFAULT_TEMPERATURE,
    top_p: Sequence[float] = DEFAULT_TOP_P,
) -> jax.Array:
    """Sample all 8 fields of one octuple; returns (B, 8) int32.

    Vectorized: the 8 fields are padded to (B, 8, Vmax) and sampled in ONE
    fused nucleus pass (one sort, one categorical) instead of 8 sequential
    per-field passes — the decode loop runs this every generated token, so
    kernel-launch count matters more than the padded FLOPs (Vmax = 262).
    Identical per-field distribution to :func:`nucleus_sample`.
    """
    fields = split_fields(fused_logits[:, None, :], cfg)
    Vmax = max(cfg.field_sizes)
    padded = jnp.stack(
        [jnp.pad(fields[i][:, 0, :].astype(jnp.float32),
                 ((0, 0), (0, Vmax - cfg.field_sizes[i])),
                 constant_values=-jnp.inf)
         for i in range(cfg.n_fields)], axis=1)            # (B, 8, Vmax)
    t = jnp.asarray(temperature, jnp.float32)[None, :, None]
    p = jnp.asarray(top_p, jnp.float32)[None, :, None]
    toks = _nucleus_core(rng, padded, p, t)                # (B, 8)
    return toks.astype(jnp.int32)


def greedy_octuple(fused_logits: jax.Array, cfg: PianoBartConfig) -> jax.Array:
    """Per-field argmax (the trainers' accuracy path, pretrain.py:164-168)."""
    fields = split_fields(fused_logits, cfg)
    return jnp.stack([f.argmax(axis=-1) for f in fields], axis=-1).astype(jnp.int32)
