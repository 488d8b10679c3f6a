"""Bit-sampled dropout.

``flax.linen.Dropout`` draws a float32 uniform per element
(``jax.random.bernoulli``: 32 random bits + bitcast + float compare).  Mask
generation is the dominant cost of dropout on TPU for this model — 42
(B, S, d_model) masks per train step — so we draw **uint16 lanes** instead
and compare against an integer threshold: half the generated entropy and no
float conversion, identical keep probability up to 2^-16 quantization
(rate 0.1 becomes 0.1000061).

The reference trains with the torch/HF default dropout semantics
(``transformers`` Bart, ``PianoBart.py:23``); eval numerics are unaffected
(dropout off), so checkpoint-parity tests don't see this op.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Dropout"]


class Dropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` (rng collection "dropout")."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        rng = self.make_rng("dropout")
        # P(bits < thresh) = thresh / 2^16 = drop probability
        thresh = jnp.uint16(int(round(self.rate * 65536.0)))
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint16)
        scale = jnp.asarray(1.0 / (1.0 - self.rate), x.dtype)
        return jnp.where(bits >= thresh, x * scale, jnp.zeros_like(x))
