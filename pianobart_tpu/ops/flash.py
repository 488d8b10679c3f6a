"""Pallas flash-attention kernel (TPU).

Placeholder dispatch target for :func:`pianobart_tpu.ops.attention.
dot_product_attention`; the fused kernel lands behind this interface so the
model code never changes.  Raising ``NotImplementedError`` falls back to the
XLA path.
"""
from __future__ import annotations


def flash_attention(q, k, v, bias):
    raise NotImplementedError
