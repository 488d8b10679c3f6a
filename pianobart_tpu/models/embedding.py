"""Octuple input embeddings.

The reference performs 8 separate ``nn.Embedding`` lookups, concatenates to
2048 features, and projects to d_model with a shared linear
(``PianoBart.py:44-52, 60-71``).  TPU-native formulation: the 8 per-field
tables are fused into ONE ``(1280, 256)`` table indexed by
``ids + field_offset`` — a single gather instead of eight — followed by the
fusion matmul, which XLA fuses with the √d scaling.  Parameter-for-parameter
equivalent to the reference (the torch import shim row-concatenates the 8
tables), so checkpoint parity is preserved.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import PianoBartConfig


class OctupleEmbedding(nn.Module):
    """ids (B, S, 8) -> fused embeddings (B, S, d_model)."""

    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        table = self.param(
            "table",
            nn.with_partitioning(nn.initializers.normal(1.0), ("vocab", None)),
            (cfg.total_vocab, cfg.emb_size), cfg.param_dtype)
        offsets = jnp.asarray(cfg.field_offsets, dtype=ids.dtype)
        flat_ids = ids + offsets  # (B, S, 8) in fused vocab space
        emb = jnp.take(table, flat_ids, axis=0)            # (B, S, 8, E)
        emb = emb.astype(cfg.dtype) * math.sqrt(cfg.emb_size)  # PianoBart.py:16
        emb = emb.reshape(*ids.shape[:-1], cfg.n_fields * cfg.emb_size)
        fusion = nn.Dense(
            cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.normal(0.02), ("fused", "embed")),
            name="fusion")
        return fusion(emb)


class LabelEmbedding(nn.Module):
    """Replacement decoder embedding for the velocity finetune.

    Mirrors ``change_decoder_embedding`` (PianoBart.py:88-91,
    model.py:242-245): label ids (B, S) -> 64-d scaled embedding -> linear
    to d_model.
    """

    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        assert cfg.decoder_label_vocab is not None
        table = self.param(
            "table", nn.initializers.normal(1.0),
            (cfg.decoder_label_vocab, cfg.decoder_label_dim), cfg.param_dtype)
        emb = jnp.take(table, ids, axis=0).astype(cfg.dtype)
        emb = emb * math.sqrt(cfg.decoder_label_dim)
        proj = nn.Dense(cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="proj")
        return proj(emb)
