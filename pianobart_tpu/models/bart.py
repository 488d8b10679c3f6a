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

import math
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import PianoBartConfig
from ..ops.attention import dot_product_attention
from ..ops.dropout import Dropout

KVCache = Dict[str, Any]

NEG_INF = -1e9

# Step-perf experiments (read once at import, same policy as ops/flash.py):
# * PBX_QKV_FUSED=1 — compute the q/k/v projections of one attention module
#   as ONE (d, 3d) matmul (k/v as (d, 2d) for cross-attention), concatenating
#   the per-projection kernels at apply time.  Param tree unchanged
#   (q_proj/k_proj/v_proj survive for checkpoint parity); numerics identical
#   (each output column is the same dot product).
# * PBX_FFN_2D — run the FFN matmuls on (B*S, d) views; the 3D formulation
#   makes XLA pick a {1,2,0} layout for the fc2 forward output and pay a
#   ~10 ms/step copy (xprof, ROADMAP.md).  Measured +5.6% full step
#   (step_lab, 438.0 -> 414.6 ms) — ON by default; PBX_FFN_2D=0 reverts.
#   Applied only when the static token count B*S >= 4096: at KV-cached
#   decode shapes the same views slow the whole loop ~17% (decode_lab,
#   0.404 vs 0.473 s batch-1 medians), so small shapes keep the 3D path.
# * PBX_FUSED_DROPLN=1 — run every sublayer tail
#   LayerNorm(residual + dropout(h)) as ONE pallas kernel with in-kernel
#   PRNG (ops/fused_ln.py): no (B, S, D) dropout masks materialize in HBM
#   (1.3 GB of backward residuals at the flagship shape) and the
#   select+add+reduce loop fusions collapse into the same pass.
_QKV_FUSED = os.environ.get("PBX_QKV_FUSED", "0") == "1"
_FFN_2D = os.environ.get("PBX_FFN_2D", "1") == "1"
# Token-count gate for the 2D FFN views (see above): training shapes
# (B*S >= this) take the 2D path, decode/eval-tail shapes keep 3D.
_FFN_2D_MIN_TOKENS = 4096
_FUSED_DROPLN = os.environ.get("PBX_FUSED_DROPLN", "0") == "1"


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


class _ProjParams(nn.Module):
    """Declares an ``nn.Dense``-compatible (kernel, bias) pair WITHOUT the
    matmul, so a parent can concatenate several projections into one matmul
    (``PBX_QKV_FUSED``).  Same param names/shapes/init as ``_dense`` — the
    checkpoint tree is indistinguishable."""

    d_in: int
    d_out: int
    cfg: PianoBartConfig
    kernel_axes: Tuple[Optional[str], Optional[str]]

    @nn.compact
    def __call__(self) -> Tuple[jax.Array, jax.Array]:
        kernel = self.param(
            "kernel",
            nn.with_partitioning(nn.initializers.normal(stddev=0.02),
                                 self.kernel_axes),
            (self.d_in, self.d_out), self.cfg.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.d_out,), self.cfg.param_dtype)
        return kernel, bias


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

        if (cfg.ring_axis is not None and cfg.ring_tp_axis is not None
                and cache is None and cache_index is None):
            # TP∘SP: this tp shard projects and ring-attends H/ntp heads.
            # Column-parallel q/k/v (kernel column slices), row-parallel
            # out_proj (+psum); see ops/ring.py collectives for why each
            # fwd/bwd pair is explicit.
            from ..ops.ring import (psum_out, replicated_in, ring_attention,
                                    tp_slice)
            ax = cfg.ring_tp_axis
            ntp = cfg.ring_tp_size
            Hl = H // ntp
            assert H % ntp == 0, (H, ntp)
            DHl = Hl * Dh
            start = jax.lax.axis_index(ax) * DHl
            dt = cfg.dtype
            xq_r = replicated_in(x_q, ax)
            xkv_r = xq_r if x_kv is x_q else replicated_in(x_kv, ax)
            Wq, bq = _ProjParams(D, D, cfg, ("embed", "qkv"), name="q_proj")()
            Wk, bk = _ProjParams(D, D, cfg, ("embed", "qkv"), name="k_proj")()
            Wv, bv = _ProjParams(D, D, cfg, ("embed", "qkv"), name="v_proj")()
            Wo, bo = _ProjParams(D, D, cfg, ("qkv", "embed"),
                                 name="out_proj")()

            def proj(x, W, b):
                y = (x.astype(dt)
                     @ tp_slice(W, start, DHl, 1, ax, D).astype(dt)
                     + tp_slice(b, start, DHl, 0, ax, D).astype(dt))
                return y.reshape(y.shape[0], y.shape[1], Hl, Dh)

            q = proj(xq_r, Wq, bq) * (Dh ** -0.5)
            k = proj(xkv_r, Wk, bk)
            v = proj(xkv_r, Wv, bv)
            if kv_mask is None:
                kv_mask = jnp.ones((B, k.shape[1]), jnp.float32)
            out = ring_attention(q, k, v, kv_mask, self.causal, cfg.ring_axis)
            out = out.reshape(B, Sq, DHl)
            partial = out @ tp_slice(Wo, start, DHl, 0, ax, D).astype(dt)
            return psum_out(partial, ax) + bo.astype(dt), None

        use_cached_kv = cache is not None and "k" in cache and cache_index is None
        if _QKV_FUSED and cache is None and cache_index is None:
            # One fused projection matmul per module (see flag docstring).
            dt = cfg.dtype
            Wq, bq = _ProjParams(D, D, cfg, ("embed", "qkv"), name="q_proj")()
            Wk, bk = _ProjParams(D, D, cfg, ("embed", "qkv"), name="k_proj")()
            Wv, bv = _ProjParams(D, D, cfg, ("embed", "qkv"), name="v_proj")()
            if x_q is x_kv:   # self-attention: one (D, 3D) matmul
                W = jnp.concatenate([Wq, Wk, Wv], axis=1).astype(dt)
                b = jnp.concatenate([bq, bk, bv]).astype(dt)
                q_, k_, v_ = jnp.split(x_q.astype(dt) @ W + b, 3, axis=-1)
            else:             # cross-attention: q alone, one (D, 2D) for k/v
                q_ = x_q.astype(dt) @ Wq.astype(dt) + bq.astype(dt)
                W = jnp.concatenate([Wk, Wv], axis=1).astype(dt)
                b = jnp.concatenate([bk, bv]).astype(dt)
                k_, v_ = jnp.split(x_kv.astype(dt) @ W + b, 2, axis=-1)
            q = heads(q_) * (Dh ** -0.5)
            k, v = heads(k_), heads(v_)
        else:
            q = heads(_dense(D, cfg, ("embed", "qkv"), "q_proj")(x_q)) * (Dh ** -0.5)
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

class FeedForward(nn.Module):
    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        shape3 = x.shape
        # 2D views only pay off at training token counts, where they kill
        # fc2's {1,2,0} output-layout copy (438.0 -> 414.6 ms, step_lab).
        # At KV-cached decode shapes ((B, 1, d) per step) the SAME views
        # make the whole 1024-step loop ~17% slower (decode_lab, 0.404 vs
        # 0.473 s median) — the reshapes change XLA's in-loop layout
        # choices.  Shapes are static under jit, so gate on token count.
        use_2d = _FFN_2D and math.prod(shape3[:-1]) >= _FFN_2D_MIN_TOKENS
        if use_2d:
            x = x.reshape(-1, shape3[-1])   # (B*S, d): friendlier fc2 layout
        h = _dense(cfg.ffn_dim, cfg, ("embed", "mlp"), "fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = Dropout(cfg.activation_dropout)(h, deterministic=deterministic)
        h = _dense(cfg.d_model, cfg, ("mlp", "embed"), "fc2")(h)
        if use_2d:
            h = h.reshape(shape3)
        return h


def _layer_norm(cfg: PianoBartConfig, name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name=name)


class ResidualDropoutLN(nn.Module):
    """``LayerNorm(residual + dropout(h))`` — the tail of every sublayer.

    Declares the SAME (scale, bias) params as ``nn.LayerNorm`` so the
    checkpoint tree is unchanged; name instances after the LayerNorm they
    replace (e.g. ``self_attn_layer_norm``).  Under ``PBX_FUSED_DROPLN`` on
    TPU training shapes, the whole tail runs as one pallas kernel
    (ops/fused_ln.py); otherwise the exact unfused composition
    (``Dropout`` + flax-LayerNorm semantics: f32 fast-variance stats,
    ``(x - mean) * (rsqrt(var + eps) * scale) + bias``, cast to dtype).
    """

    cfg: PianoBartConfig

    @nn.compact
    def __call__(self, residual: jax.Array, h: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        D = h.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (D,),
                           cfg.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (D,),
                          cfg.param_dtype)
        if (_FUSED_DROPLN and not deterministic and cfg.dropout > 0.0
                and jax.default_backend() == "tpu"):
            from ..ops.fused_ln import dropout_add_ln, fused_eligible
            if fused_eligible(h.shape):
                seed = jax.random.bits(self.make_rng("dropout"),
                                       dtype=jnp.uint32)
                return dropout_add_ln(h, residual, scale, bias, seed,
                                      cfg.dropout)
        hd = Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = residual + hd
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = jnp.maximum(0.0, (xf * xf).mean(-1, keepdims=True)
                          - mean * mean)
        mul = jax.lax.rsqrt(var + 1e-5) * scale.astype(jnp.float32)
        y = (xf - mean) * mul + bias.astype(jnp.float32)
        return y.astype(cfg.dtype)


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
        x = ResidualDropoutLN(cfg, name="self_attn_layer_norm")(
            residual, h, deterministic)

        residual = x
        h = _ffn_cls(cfg)(cfg, name="ffn")(x, deterministic)
        return ResidualDropoutLN(cfg, name="final_layer_norm")(
            residual, h, deterministic)


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
        x = ResidualDropoutLN(cfg, name="self_attn_layer_norm")(
            residual, h, deterministic)

        residual = x
        h, new_cross = MultiHeadAttention(cfg, name="cross_attn")(
            x, enc_out, kv_mask=enc_mask,
            cache=None if cache is None else cache.get("cross"),
            deterministic=deterministic)
        x = ResidualDropoutLN(cfg, name="cross_attn_layer_norm")(
            residual, h, deterministic)

        residual = x
        h = _ffn_cls(cfg)(cfg, name="ffn")(x, deterministic)
        x = ResidualDropoutLN(cfg, name="final_layer_norm")(
            residual, h, deterministic)

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
