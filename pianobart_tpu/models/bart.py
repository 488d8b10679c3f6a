"""TPU-native BART encoder-decoder trunk.

Replaces the reference's dependency on ``transformers.BartModel``
(``PianoBart.py:23``) with a flax implementation that reproduces HF Bart
numerics exactly (verified against torch in ``tests/test_ref_parity_model.py``):

* learned positional embeddings with offset 2 (HF ``BartLearnedPositionalEmbedding``),
* ``layernorm_embedding`` after input+pos, post-LN residual blocks, GELU FFN,
* q scaled by ``head_dim**-0.5``; additive padding/causal masks.

TPU-first details: activations in a configurable compute dtype (bf16 for
training), attention runs through :mod:`pianobart_tpu.ops.attention`
(pallas flash kernel or XLA fallback), tensor-parallel sharding is declared
with logical axis names on every kernel, and the decoder supports an explicit
functional KV cache for the scanned decode loop (the reference re-encodes all
1024 positions per generated token, ``model.py:42-65``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import PianoBartConfig
from ..ops.attention import dot_product_attention
from ..ops.dropout import Dropout

KVCache = Dict[str, Any]

NEG_INF = -1e9


def _constrain_activations(x: jax.Array, cfg=None) -> jax.Array:
    """Logical sharding hint for (batch, seq, embed) activations.

    Under ``nn.logical_axis_rules`` mapping batch->dp and seq->sp this
    shards the sequence axis over the ``sp`` mesh axis (sequence
    parallelism); with no rules in scope it is a no-op.  Skipped on the
    ring-attention path (``cfg.ring_axis``): there the model body runs
    inside ``shard_map`` where every mesh axis is Manual and
    ``with_sharding_constraint`` is illegal — sharding is already explicit.
    """
    if cfg is not None and cfg.ring_axis is not None:
        return x
    return nn.with_logical_constraint(x, ("batch", "seq", "embed"))


def _dense(features: int, cfg: PianoBartConfig, kernel_axes, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
        kernel_init=nn.with_partitioning(
            nn.initializers.normal(stddev=0.02), kernel_axes),
        name=name,
    )


class MultiHeadAttention(nn.Module):
    """HF-Bart-compatible MHA with optional explicit KV cache."""

    cfg: PianoBartConfig
    causal: bool = False

    @nn.compact
    def __call__(
        self,
        x_q: jax.Array,                     # (B, Sq, D)
        x_kv: jax.Array,                    # (B, Skv, D)
        kv_mask: Optional[jax.Array] = None,  # (B, Skv) 1=attend
        cache: Optional[KVCache] = None,
        cache_index: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[KVCache]]:
        cfg = self.cfg
        B, Sq, D = x_q.shape
        H, Dh = cfg.num_heads, cfg.head_dim

        def heads(x):
            return x.reshape(x.shape[0], x.shape[1], H, Dh)

        q = heads(_dense(D, cfg, ("embed", "qkv"), "q_proj")(x_q)) * (Dh ** -0.5)
        use_cached_kv = cache is not None and "k" in cache and cache_index is None
        if use_cached_kv:
            # Cross-attention during decode: keys/values precomputed.
            k, v = cache["k"], cache["v"]
        else:
            k = heads(_dense(D, cfg, ("embed", "qkv"), "k_proj")(x_kv))
            v = heads(_dense(D, cfg, ("embed", "qkv"), "v_proj")(x_kv))

        new_cache: Optional[KVCache] = None
        if cache is not None and not use_cached_kv and cache_index is None:
            # Cache build pass (cross-attention prefill): keys/values from the
            # encoder output are computed once and reused every decode step.
            new_cache = {"k": k, "v": v}
        if cache_index is not None:
            # Incremental decode: write this step's K/V at cache_index.
            ck = jax.lax.dynamic_update_slice(cache["k"], k, (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cache["v"], v, (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = {"k": ck, "v": cv}
            Skv = k.shape[1]
            pos = jnp.arange(Skv)
            step_mask = (pos <= cache_index)[None, :]  # causal via cache index
            kv_mask = step_mask if kv_mask is None else (kv_mask * step_mask)
        elif use_cached_kv:
            new_cache = cache

        if cfg.ring_axis is not None and cache is None and cache_index is None:
            # sequence-parallel path: q/k/v hold LOCAL sequence shards inside
            # shard_map; keys/values rotate around the ring_axis ring
            from ..ops.ring import ring_attention
            if kv_mask is None:
                kv_mask = jnp.ones((B, k.shape[1]), jnp.float32)
            out = ring_attention(q, k, v, kv_mask,
                                 self.causal, cfg.ring_axis)
        else:
            out = dot_product_attention(
                q, k, v,
                kv_mask=kv_mask,
                causal=self.causal and cache_index is None,
                dropout_rate=cfg.attention_dropout,
                deterministic=deterministic,
                dropout_rng=(None if deterministic
                             or cfg.attention_dropout == 0.0
                             else self.make_rng("dropout")),
                use_flash=cfg.use_flash_attention,
            )
        out = out.reshape(B, Sq, D)
        out = _dense(D, cfg, ("qkv", "embed"), "out_proj")(out)
        return out, new_cache

    def init_cache(self, batch: int, length: int) -> KVCache:
        cfg = self.cfg
        shape = (batch, length, cfg.num_heads, cfg.head_dim)
        return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


class FeedForward(nn.Module):
    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = _dense(cfg.ffn_dim, cfg, ("embed", "mlp"), "fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = Dropout(cfg.activation_dropout)(h, deterministic=deterministic)
        h = _dense(cfg.d_model, cfg, ("mlp", "embed"), "fc2")(h)
        return h


def _layer_norm(cfg: PianoBartConfig, name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name=name)


def _ffn_cls(cfg: PianoBartConfig):
    """FeedForward, optionally remat'ed (recompute fc1/GELU in backward)."""
    if cfg.remat_ffn and not cfg.remat:
        return nn.remat(FeedForward, static_argnums=(2,))
    return FeedForward


class EncoderLayer(nn.Module):
    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        cfg = self.cfg
        residual = x
        h, _ = MultiHeadAttention(cfg, name="self_attn")(
            x, x, kv_mask=pad_mask, deterministic=deterministic)
        h = Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = _layer_norm(cfg, "self_attn_layer_norm")(residual + h)

        residual = x
        h = _ffn_cls(cfg)(cfg, name="ffn")(x, deterministic)
        h = Dropout(cfg.dropout)(h, deterministic=deterministic)
        return _layer_norm(cfg, "final_layer_norm")(residual + h)


class DecoderLayer(nn.Module):
    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, x, enc_out, self_mask, enc_mask, cache=None,
                 cache_index=None, deterministic=True):
        cfg = self.cfg
        residual = x
        h, new_self = MultiHeadAttention(cfg, causal=True, name="self_attn")(
            x, x, kv_mask=self_mask,
            cache=None if cache is None else cache.get("self"),
            cache_index=cache_index, deterministic=deterministic)
        h = Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = _layer_norm(cfg, "self_attn_layer_norm")(residual + h)

        residual = x
        h, new_cross = MultiHeadAttention(cfg, name="cross_attn")(
            x, enc_out, kv_mask=enc_mask,
            cache=None if cache is None else cache.get("cross"),
            deterministic=deterministic)
        h = Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = _layer_norm(cfg, "cross_attn_layer_norm")(residual + h)

        residual = x
        h = _ffn_cls(cfg)(cfg, name="ffn")(x, deterministic)
        h = Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = _layer_norm(cfg, "final_layer_norm")(residual + h)

        new_cache = None
        if new_self is not None or new_cross is not None:
            new_cache = {"self": new_self, "cross": new_cross}
        return x, new_cache


class PositionalEmbedding(nn.Module):
    """HF BartLearnedPositionalEmbedding: table row = position + offset."""

    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, seq_len: int, start: Any = 0) -> jax.Array:
        cfg = self.cfg
        table = self.param(
            "embedding",
            nn.with_partitioning(nn.initializers.normal(0.02), (None, "embed")),
            (cfg.max_len + cfg.pos_offset, cfg.d_model), cfg.param_dtype)
        if cfg.ring_axis is not None:
            # sequence-parallel: this shard covers global positions
            # [axis_index * seq_len, ...)
            start = start + jax.lax.axis_index(cfg.ring_axis) * seq_len
        if isinstance(start, int) and start == 0:
            return table[cfg.pos_offset:cfg.pos_offset + seq_len].astype(cfg.dtype)
        return jax.lax.dynamic_slice_in_dim(
            table, start + cfg.pos_offset, seq_len, axis=0).astype(cfg.dtype)


class Encoder(nn.Module):
    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, inputs_embeds, pad_mask=None, deterministic=True):
        cfg = self.cfg
        S = inputs_embeds.shape[1]
        x = inputs_embeds + PositionalEmbedding(cfg, name="embed_positions")(S)
        x = _layer_norm(cfg, "layernorm_embedding")(x)
        x = Dropout(cfg.dropout)(x, deterministic=deterministic)
        x = _constrain_activations(x, cfg)
        layer_cls = EncoderLayer
        if cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        for i in range(cfg.encoder_layers):
            x = layer_cls(cfg, name=f"layers_{i}")(x, pad_mask, deterministic)
            x = _constrain_activations(x, cfg)
        return x


class Decoder(nn.Module):
    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, inputs_embeds, enc_out, self_mask=None, enc_mask=None,
                 cache=None, cache_index=None, deterministic=True):
        cfg = self.cfg
        S = inputs_embeds.shape[1]
        start = 0 if cache_index is None else cache_index
        x = inputs_embeds + PositionalEmbedding(cfg, name="embed_positions")(S, start)
        x = _layer_norm(cfg, "layernorm_embedding")(x)
        x = Dropout(cfg.dropout)(x, deterministic=deterministic)
        if cache is None:
            x = _constrain_activations(x, cfg)
        new_cache = {}
        layer_cls = DecoderLayer
        if cfg.remat and cache is None:
            layer_cls = nn.remat(DecoderLayer, static_argnums=(7,))
        for i in range(cfg.decoder_layers):
            x, lc = layer_cls(cfg, name=f"layers_{i}")(
                x, enc_out, self_mask, enc_mask,
                None if cache is None else cache.get(f"layers_{i}"),
                cache_index, deterministic)
            if lc is not None:
                new_cache[f"layers_{i}"] = lc
            if cache is None:
                x = _constrain_activations(x, cfg)
        return x, (new_cache or None)
