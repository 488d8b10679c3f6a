"""Output heads.

* :class:`OctupleLMHead` — the reference's 8 per-field ``nn.Linear`` heads
  (``model.py:109-126``) fused into one ``(d_model, 1280)`` matmul feeding the
  MXU; logits are sliced per field by the loss/sampler.
* :class:`AttentionPooling` + :class:`SequenceClassifierHead` — structured
  self-attention pooling and MLP (``model.py:128-143, 165-218``).
* :class:`TokenClassifierHead` — per-position MLP (``model.py:247-253``).
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import PianoBartConfig


def split_fields(logits: jax.Array, cfg: PianoBartConfig) -> List[jax.Array]:
    """Slice fused (B, S, 1280) logits into 8 per-field tensors."""
    out = []
    for off, size in zip(cfg.field_offsets, cfg.field_sizes):
        out.append(jax.lax.slice_in_dim(logits, off, off + size, axis=-1))
    return out


class OctupleLMHead(nn.Module):
    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        cfg = self.cfg
        proj = nn.Dense(
            cfg.total_vocab, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.normal(0.02), ("embed", "vocab")),
            name="proj")
        return proj(hidden)  # fused (B, S, total_vocab)


class AttentionPooling(nn.Module):
    """Structured self-attention pooling (model.py:128-143): softmax over the
    sequence axis of ws2(tanh(ws1(h))), r pooled views."""

    da: int = 128
    r: int = 4

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:  # (B, S, D) -> (B, r, D)
        scores = nn.Dense(self.r, use_bias=False, name="ws2")(
            jnp.tanh(nn.Dense(self.da, use_bias=False, name="ws1")(h)))
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(h.dtype)
        return jnp.einsum("bsr,bsd->brd", attn, h)


class SequenceClassifierHead(nn.Module):
    cfg: PianoBartConfig
    class_num: int
    da: int = 128
    r: int = 4

    @nn.compact
    def __call__(self, hidden: jax.Array, deterministic: bool = True) -> jax.Array:
        pooled = AttentionPooling(self.da, self.r, name="attention")(hidden)
        flat = pooled.reshape(pooled.shape[0], -1)
        x = nn.Dropout(0.1)(flat, deterministic=deterministic)
        x = nn.relu(nn.Dense(256, dtype=self.cfg.dtype,
                             param_dtype=self.cfg.param_dtype, name="dense1")(x))
        return nn.Dense(self.class_num, dtype=self.cfg.dtype,
                        param_dtype=self.cfg.param_dtype, name="dense2")(x)


class TokenClassifierHead(nn.Module):
    cfg: PianoBartConfig
    class_num: int

    @nn.compact
    def __call__(self, hidden: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dropout(0.1)(hidden, deterministic=deterministic)
        x = nn.relu(nn.Dense(256, dtype=self.cfg.dtype,
                             param_dtype=self.cfg.param_dtype, name="dense1")(x))
        return nn.Dense(self.class_num, dtype=self.cfg.dtype,
                        param_dtype=self.cfg.param_dtype, name="dense2")(x)


class Excitation(nn.Module):
    """Squeeze-and-excitation gate (reference model.py:220-232).

    Defined (and left unused) by the reference's classifier experiments;
    provided for checkpoint/API completeness.
    """

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        y = nn.relu(nn.Dense(c // self.reduction, name="fc1")(x))
        y = nn.sigmoid(nn.Dense(c, name="fc2")(y))
        return x * y
