"""Bit-sampled dropout.

``flax.linen.Dropout`` draws a float32 uniform per element
(``jax.random.bernoulli``: 32 random bits + bitcast + float compare).  Mask
generation is the dominant cost of dropout on TPU for this model — 42
(B, S, d_model) masks per train step, ~31 ms measured at B=32 even with
the fast rbg generator — so we draw **uint8 lanes** instead and compare
against an integer threshold: a quarter of the generated entropy and no
float conversion.  Keep probability is quantized to 2^-8 (rate 0.1 becomes
26/256 = 0.1016); the 1/(1-p) rescale uses the ACTUAL quantized rate, so
activations stay exactly unbiased.

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
        # P(bits < thresh) = thresh / 2^8 = actual drop probability.
        # Clamp to 255: rates in [0.998, 1.0) would round t to 256, which
        # overflows uint8 and zero-divides the keep scale (round-3 review);
        # 255/256 is the closest representable drop probability.
        t = min(int(round(self.rate * 256.0)), 255)
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
        scale = jnp.asarray(256.0 / (256.0 - t), x.dtype)
        return jnp.where(bits >= jnp.uint8(t), x * scale, jnp.zeros_like(x))
