"""Attention compute path.

Single entry point used by every attention module in the framework
(encoder self, decoder causal self, cross): layout ``(B, S, H, Dh)``.
Two backends:

* ``_xla_attention`` — einsum formulation; XLA already fuses the softmax
  chain well on TPU and handles arbitrary biases.
* ``flash_attention`` (``pianobart_tpu.ops.flash``) — pallas kernel for the
  TPU MXU, used for the long-sequence encoder/decoder training path when
  shapes meet its tiling constraints.

The reference outsources this entirely to ``transformers``/cuDNN
(``PianoBart.py:23``); here it is an explicit, swappable op.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]


def _xla_attention(q, k, v, bias, dropout_rate, deterministic, dropout_rng):
    # q is pre-scaled by the caller (HF convention: q *= head_dim**-0.5).
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_eligible(q, k) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # Kernel tiling: block sizes of 128 on both sequence axes.
    return (q.shape[1] % 128 == 0 and k.shape[1] % 128 == 0
            and q.shape[3] % 128 == 0 and q.shape[1] > 128)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    use_flash: bool = True,
) -> jax.Array:
    """Scaled dot-product attention over ``(B, S, H, Dh)`` tensors.

    ``bias`` is additive with shape broadcastable to ``(B, H, Sq, Skv)``.
    """
    if (use_flash and dropout_rate == 0.0 and _flash_eligible(q, k)):
        try:
            from .flash import flash_attention
            return flash_attention(q, k, v, bias)
        except NotImplementedError:
            pass
    return _xla_attention(q, k, v, bias, dropout_rate, deterministic, dropout_rng)
