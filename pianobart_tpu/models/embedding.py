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

import functools
import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import PianoBartConfig

# Backward of the fused-table gather: XLA lowers the natural formulation to
# a scatter-add over the (1280, 256) table — measured ~13 ms/step at B=32
# (xprof, ROADMAP.md).  With the flag on, the gather carries a custom VJP
# whose backward is 8 PER-FIELD one-hot (N, size_f)^T x (N, E) MXU matmuls
# (bf16 operands, f32 accumulation) concatenated into the fused table grad.
# (A single (N, 1280) one-hot matmul was tried first and proved
# compile-pathological — the remote XLA compile ran >30 min.)  Read once at
# import (env is not a jit cache key), same policy as ops/flash.py.
# Measured +1.2% full step alone and +1.2% on top of FFN-2D (step_lab,
# 414.3 -> 409.4/408.7 ms) — ON by default; PBX_EMB_ONEHOT_BWD=0 reverts.
_ONEHOT_BWD = os.environ.get("PBX_EMB_ONEHOT_BWD", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_rows(table: jax.Array, flat_ids: jax.Array,
                 field_sizes, op_dtype) -> jax.Array:
    return jnp.take(table, flat_ids, axis=0)


def _gather_rows_fwd(table, flat_ids, field_sizes, op_dtype):
    # residuals must be jax types: carry the table dtype via an empty proto
    return jnp.take(table, flat_ids, axis=0), (
        flat_ids, jnp.zeros((0,), table.dtype))


def _gather_rows_bwd(field_sizes, op_dtype, res, g):
    flat_ids, proto = res
    table_dtype = proto.dtype
    # op_dtype follows the model compute dtype (OctupleEmbedding): under
    # bf16 training the cotangent's VALUES are already bf16-representable
    # (it came through the bf16 activation cast), so bf16 MXU operands are
    # lossless; an f32 model keeps exact f32 operands rather than rounding
    # a genuinely-f32 cotangent (round-2 review finding).  One-hot values
    # are exact in any dtype; accumulation is always f32.
    parts = []
    off = 0
    for f, size in enumerate(field_sizes):
        local = flat_ids[..., f].reshape(-1) - off       # (N,) in [0, size)
        g_f = g[..., f, :].reshape(local.shape[0], g.shape[-1])
        onehot = jax.nn.one_hot(local, size, dtype=op_dtype)
        parts.append(jax.lax.dot_general(
            onehot, g_f.astype(op_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        off += size
    dtable = jnp.concatenate(parts, axis=0)
    return (dtable.astype(table_dtype),
            jnp.zeros(flat_ids.shape, dtype=jax.dtypes.float0))


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


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
        if _ONEHOT_BWD:
            op_dtype = (jnp.bfloat16 if cfg.dtype == jnp.bfloat16
                        else jnp.float32)
            emb = _gather_rows(table, flat_ids, cfg.field_sizes,
                               op_dtype)  # (B,S,8,E)
        else:
            emb = jnp.take(table, flat_ids, axis=0)    # (B, S, 8, E)
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
