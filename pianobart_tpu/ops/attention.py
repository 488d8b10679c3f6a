"""Attention compute path.

Single entry point used by every attention module in the framework
(encoder self, decoder causal self, cross): layout ``(B, S, H, Dh)``.

Backends:

* **flash** — pallas TPU kernel (blockwise online-softmax): the (S, S)
  score matrix never materializes in HBM.  Without it the full PianoBART
  train step is infeasible on one v5e chip: XLA's backward keeps
  24 × (B=16, 8, 1024, 1024) f32 score buffers = 16.4 GB > 15.75 GB HBM
  (measured).  Padding is expressed as segment ids, causality as a flag.
  Uses our kernel (:mod:`pianobart_tpu.ops.flash`), which measures ~2x
  faster end-to-end than JAX's reference pallas kernel on this workload
  (255 ms vs 529 ms full train step, B=16, v5e); set ``PBX_FLASH_IMPL=jax``
  to switch.
* **xla** — einsum + softmax fallback (CPU tests, decode steps with Sq=1,
  dropout, or odd shapes).

The reference outsources this entirely to ``transformers``/cuDNN
(``PianoBart.py:23``); here it is an explicit, swappable op.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]

NEG_INF = -1e9


def _build_bias(kv_mask, causal, Sq, Skv, dtype):
    bias = None
    if kv_mask is not None:
        bias = jnp.where(kv_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
    if causal:
        tri = jnp.tril(jnp.ones((Sq, Skv), dtype=bool), Skv - Sq)
        cb = jnp.where(tri[None, None, :, :], 0.0, NEG_INF)
        bias = cb if bias is None else bias + cb
    return bias


def _xla_attention(q, k, v, kv_mask, causal, bias, dropout_rate,
                   deterministic, dropout_rng):
    # q is pre-scaled by the caller (HF convention: q *= head_dim**-0.5).
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    b = _build_bias(kv_mask, causal, q.shape[1], k.shape[1], logits.dtype)
    if b is not None:
        logits = logits + b.astype(logits.dtype)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_eligible(q, k, bias) -> bool:
    if bias is not None:
        return False
    if (jax.default_backend() != "tpu"
            and os.environ.get("PBX_FLASH_INTERPRET", "0") != "1"):
        # PBX_FLASH_INTERPRET=1 lets CPU dryruns/tests exercise the pallas
        # kernels (interpret mode) under real mesh shardings — a test lever,
        # not a perf lever (ops/flash.py auto-interprets off-TPU).
        return False
    # kernel tiling: sequence blocks of 128+, lane-aligned head dim
    return (q.shape[1] % 128 == 0 and k.shape[1] % 128 == 0
            and q.shape[3] % 128 == 0 and q.shape[1] >= 256
            and k.shape[1] >= 256)


def _resolve_thread_resources():
    """Locate jax's thread-local mesh state ONCE at import time.

    Primary path is the public ``jax.interpreters.pxla`` re-export (the
    same object as ``jax._src.mesh.thread_resources``; deprecation
    suppressed because we pin the fallback chain with a test).  If every
    path vanishes in a jax upgrade the failure is LOUD — a warning at
    import plus ``tests/test_flash_tp.py::test_mesh_probe_resolves``
    failing — instead of flash silently losing the shard_map wrap and
    reverting mesh runs to full-replication attention.
    """
    import warnings
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters.pxla import thread_resources
        return thread_resources
    except ImportError:
        pass
    try:
        from jax._src.mesh import thread_resources
        return thread_resources
    except ImportError:
        warnings.warn(
            "pianobart_tpu: jax thread_resources not found in this jax "
            "version; flash attention will NOT be shard_map-wrapped under "
            "dp/tp meshes (inputs would be fully replicated). Pin jax or "
            "update pianobart_tpu.ops.attention._resolve_thread_resources.")
        return None


_THREAD_RESOURCES = _resolve_thread_resources()


def _ambient_mesh():
    """The concrete mesh installed by ``with mesh:`` around the jitted
    trainers (trace-time read; empty mesh -> None).

    Returns None while tracing inside an existing shard_map region (the
    abstract mesh's axes are Manual there — public API): the sp/ring
    trainers call attention from inside their own shard_map, and a nested
    wrap over already-manual axes would fail at trace time.
    """
    am = jax.sharding.get_abstract_mesh()
    if (am is not None and not am.empty
            and jax.sharding.AxisType.Manual in am.axis_types):
        return None
    if _THREAD_RESOURCES is None:
        return None
    m = _THREAD_RESOURCES.env.physical_mesh
    return None if m.empty else m


def _flash_shard_specs(mesh, q_shape, kv_mask):
    """shard_map specs placing batch on ``dp`` and heads on ``tp``.

    XLA's SPMD partitioner cannot partition an opaque Mosaic custom call:
    under pjit a pallas kernel with dp/tp-sharded operands would be
    rescued only by full replication (an all-gather of every attention
    input — silently losing the sharding).  Production flash therefore
    rides ``shard_map``: each device runs the kernel on its local
    (B/dp, S, H/tp, D) block, which is exactly how the ring path already
    executes it (ops/ring.py).  Returns None when the wrap is unnecessary
    (single-device mesh) or impossible (indivisible B or H).
    """
    from jax.sharding import PartitionSpec as P
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    if dp * tp == 1:
        return None
    B, _, H, _ = q_shape
    dp_ax = "dp" if dp > 1 and B % dp == 0 else None
    tp_ax = "tp" if tp > 1 and H % tp == 0 else None
    if dp_ax is None and tp_ax is None:
        return None
    # A >1 mesh axis whose dim is indivisible gets declared replicated: the
    # result is still correct, but shard_map all-gathers the inputs over
    # that axis and every member redoes the full-axis attention — the exact
    # sharding loss this wrap exists to avoid.  Loud, not silent:
    import warnings
    if dp > 1 and dp_ax is None:
        warnings.warn(
            f"flash shard_map: batch {B} not divisible by dp={dp}; "
            "attention inputs will be replicated over dp (dp x redundant "
            "attention compute). Pad the batch to a dp multiple.",
            stacklevel=3)
    if tp > 1 and tp_ax is None:
        warnings.warn(
            f"flash shard_map: {H} heads not divisible by tp={tp}; "
            "attention inputs will be replicated over tp (tp x redundant "
            "attention compute).", stacklevel=3)
    qkv = P(dp_ax, None, tp_ax, None)
    mask = P(dp_ax, None) if kv_mask is not None else None
    return qkv, mask


def _flash(q, k, v, kv_mask, causal):
    if os.environ.get("PBX_FLASH_IMPL", "pbx") == "jax":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)
        qt = q.transpose(0, 2, 1, 3)   # (B, H, S, D)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        segment_ids = None
        if kv_mask is not None:
            q_seg = jnp.ones((q.shape[0], q.shape[1]), jnp.int32)
            kv_seg = kv_mask.astype(jnp.int32)
            segment_ids = SegmentIds(q=q_seg, kv=kv_seg)
        out = flash_attention(qt, kt, vt, segment_ids=segment_ids,
                              causal=causal, sm_scale=1.0)
        return out.transpose(0, 2, 1, 3).astype(v.dtype)
    from .flash import flash_attention as pbx_flash
    return pbx_flash(q, k, v, kv_mask=kv_mask, causal=causal)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,   # (B, Skv), 1 = attend
    causal: bool = False,
    bias: Optional[jax.Array] = None,      # extra additive (B,H,Sq,Skv)
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    use_flash: bool = True,
) -> jax.Array:
    """Scaled dot-product attention over ``(B, S, H, Dh)`` tensors."""
    # deterministic (eval) passes never apply dropout, so attention_dropout
    # > 0 must not knock eval off the flash path onto the O(S^2)-in-HBM
    # XLA fallback (round-3 review)
    if (use_flash and (dropout_rate == 0.0 or deterministic)
            and _flash_eligible(q, k, bias)):
        try:
            mesh = _ambient_mesh()
            specs = (_flash_shard_specs(mesh, q.shape, kv_mask)
                     if mesh is not None else None)
            if specs is not None:
                # Production flash under a dp/tp mesh: shard_map places the
                # kernel per-device (batch on dp, heads on tp) — see
                # _flash_shard_specs.  No collectives inside, so grads
                # through the kernel's custom VJP stay shard-local.
                qkv_s, mask_s = specs
                if kv_mask is None:
                    return jax.shard_map(
                        lambda q_, k_, v_: _flash(q_, k_, v_, None, causal),
                        mesh=mesh, in_specs=(qkv_s,) * 3, out_specs=qkv_s,
                        check_vma=False)(q, k, v)
                return jax.shard_map(
                    lambda q_, k_, v_, m_: _flash(q_, k_, v_, m_, causal),
                    mesh=mesh, in_specs=(qkv_s, qkv_s, qkv_s, mask_s),
                    out_specs=qkv_s, check_vma=False)(q, k, v, kv_mask)
            return _flash(q, k, v, kv_mask, causal)
        except NotImplementedError:
            pass
    return _xla_attention(q, k, v, kv_mask, causal, bias, dropout_rate,
                          deterministic, dropout_rng)
