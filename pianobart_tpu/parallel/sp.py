"""Sequence-parallel model execution (ring attention under shard_map).

Runs PianoBart modules with the SEQUENCE axis sharded over the ``sp`` mesh
axis: attention becomes ring attention (:mod:`pianobart_tpu.ops.ring`),
positional embeddings use the shard's global offset, and all position-wise
compute (layernorm/FFN/embeddings/heads) runs on local shards untouched.

This removes the reference's hard 1024-token ceiling at runtime (the
reference chunks long pieces offline, SURVEY §5); sequences of
``n_shards * local_len`` flow through the same weights.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["encode_sp"]


def encode_sp(model, params, encoder_ids, encoder_mask, mesh,
              axis_name: str = "sp"):
    """Encoder forward with the sequence axis sharded over ``axis_name``.

    ``model`` must be built with ``cfg.ring_axis == axis_name``.
    encoder_ids (B, S, 8) with S divisible by the sp axis size.
    """
    from flax import linen as nn
    params = nn.meta.unbox(params)  # logical-axis boxes confuse shard_map

    def local(params, ids, mask):
        return model.apply(params, ids, mask, method=type(model).encode)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis_name, None), P(None, axis_name)),
        out_specs=P(None, axis_name, None),
        check_vma=False,
    )(params, encoder_ids, encoder_mask)
