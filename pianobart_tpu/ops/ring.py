"""Ring attention over a sequence-parallel mesh axis.

Long-context extension beyond the reference's offline chunking (SURVEY §5:
the reference caps sequences at 1024 and splits songs offline; runtime
sequence scaling is the framework's long-context answer).

Each ``sp`` shard holds a sequence slice of q/k/v.  K/V (+ key mask) rotate
around the ring via ``ppermute``; every step computes a LOCAL flash
attention block (our pallas kernels, which expose the row log-sum-exp) and
partial outputs merge with the online-softmax identity::

    lse = logaddexp(lse_a, lse_b)
    out = out_a * exp(lse_a - lse) + out_b * exp(lse_b - lse)

Causality across shards is block-granular: k/v blocks strictly in the
future are skipped; the diagonal block uses the kernel's causal mask.

TRAINABLE: the custom VJP runs the ring again, with dK/dV accumulators
*traveling alongside their k/v blocks* — after n rotations each accumulator
arrives back at its owner having collected the contributions of every query
shard, while dQ accumulates locally.  The per-block gradients reuse the
flash backward pallas kernels with the globally-merged lse (the standard
FlashAttention decomposition of the softmax Jacobian across key blocks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .flash import (_bwd_fused_call, _delta as _flash_delta, _dkv_call,
                    _dq_call, _fused_eligible, _fwd as _flash_fwd)

__all__ = ["ring_attention", "ring_attention_sharded",
           "replicated_in", "psum_out", "tp_slice"]


# ---------------------------------------------------------------------------
# Explicit collectives for composing tensor parallelism with the ring
# (unchecked shard_map gives psum a psum transpose — the round-2 gotcha — so
# the forward/backward pairs are spelled out as custom VJPs).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def replicated_in(x, axis_name: str):
    """Mark a tp-replicated activation entering a head-sharded region.

    Forward: identity.  Backward: ``psum`` over ``axis_name`` — every tp
    shard back-propagates only its own heads' contribution to ``x``, and
    the true cotangent of a replicated input is their sum.
    """
    return x


def _repl_fwd(x, axis_name):
    return x, None


def _repl_bwd(axis_name, _, g):
    return (jax.lax.psum(g, axis_name),)


replicated_in.defvjp(_repl_fwd, _repl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_out(x, axis_name: str):
    """Merge per-shard partial outputs (row-parallel matmul tail).

    Forward: ``psum`` over ``axis_name``.  Backward: identity — the
    cotangent of the replicated sum is already what every shard needs.
    """
    return jax.lax.psum(x, axis_name)


def _psum_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _psum_bwd(axis_name, _, g):
    return (g,)


psum_out.defvjp(_psum_fwd, _psum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def tp_slice(w, start, size: int, axis: int, axis_name: str, full_size: int):
    """Slice a REPLICATED parameter for this tp shard's use.

    Forward: ``dynamic_slice_in_dim``.  Backward: scatter the slice
    cotangent into zeros and ``psum`` over ``axis_name`` — the parameter
    gradient comes out FULL and replicated on every tp shard, exactly like
    the gradients of parameters used replicated-ly, so the caller's outer
    (dp, sp) gradient psum needs no tp special-casing.  ``full_size`` is
    ``w.shape[axis]`` (static) — the backward rebuilds the full shape from
    the cotangent instead of lugging a parameter-sized zeros residual from
    forward to backward (round-3 review).
    """
    return jax.lax.dynamic_slice_in_dim(w, start, size, axis=axis)


def _tp_slice_fwd(w, start, size, axis, axis_name, full_size):
    out = jax.lax.dynamic_slice_in_dim(w, start, size, axis=axis)
    return out, (jnp.zeros((0,), w.dtype), start)   # dtype proto only


def _tp_slice_bwd(size, axis, axis_name, full_size, res, g):
    proto, start = res
    shape = list(g.shape)
    shape[axis] = full_size
    full = jax.lax.dynamic_update_slice_in_dim(
        jnp.zeros(shape, proto.dtype), g.astype(proto.dtype), start,
        axis=axis)
    return (jax.lax.psum(full, axis_name),
            np.zeros(jnp.shape(start), jax.dtypes.float0))


tp_slice.defvjp(_tp_slice_fwd, _tp_slice_bwd)


def _local_flash(q, k, v, kv_mask, causal):
    """Local flash block returning (out (B,S,H,D), lse (B,H,S))."""
    B, Sq, H, D = q.shape
    out, lse, _ = _flash_fwd(q, k, v, kv_mask, causal, None, None)
    return out.reshape(B, Sq, H, D), lse


def _merge(out_a, lse_a, out_b, lse_b):
    lse = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse)[..., None].transpose(0, 2, 1, 3)
    wb = jnp.exp(lse_b - lse)[..., None].transpose(0, 2, 1, 3)
    return (out_a.astype(jnp.float32) * wa
            + out_b.astype(jnp.float32) * wb), lse


def _ring_perm(n):
    return [(j, (j + 1) % n) for j in range(n)]


def _ring_fwd_loop(q, k, v, kv_mask, causal, axis_name):
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    B, S, H, D = q.shape

    def step(carry, i):
        out, lse, kb, vb, mb = carry
        src_shard = (my - i) % n          # whose keys we hold this step
        visible = jnp.logical_or(jnp.logical_not(causal), src_shard <= my)
        diagonal = src_shard == my

        def compute(_):
            # diagonal block: in-kernel causal mask; earlier blocks: full
            if causal:
                o_i, l_i = jax.lax.cond(
                    diagonal,
                    lambda _: _local_flash(q, kb, vb, mb, True),
                    lambda _: _local_flash(q, kb, vb, mb, False),
                    None)
            else:
                o_i, l_i = _local_flash(q, kb, vb, mb, False)
            return _merge(out, lse, o_i.astype(jnp.float32), l_i)

        out, lse = jax.lax.cond(visible, compute, lambda _: (out, lse), None)
        perm = _ring_perm(n)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        return (out, lse, kb, vb, mb), None

    out0 = jnp.zeros((B, S, H, D), jnp.float32)
    lse0 = jnp.full((B, H, S), -jnp.inf, jnp.float32)
    (out, lse, *_), _ = jax.lax.scan(
        step, (out0, lse0, k, v, kv_mask), jnp.arange(n))
    return out.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ring_attention(q, k, v, kv_mask, causal: bool = False,
                   axis_name: str = "sp"):
    """Flash attention with q/k/v sharded on ``axis_name`` (sequence axis).

    Call inside ``shard_map`` (or use :func:`ring_attention_sharded`).
    Layout (B, S_local, H, D); q pre-scaled by the caller.
    """
    out, _ = _ring_fwd_loop(q, k, v, kv_mask, causal, axis_name)
    return out


def _ring_vjp_fwd(q, k, v, kv_mask, causal, axis_name):
    out, lse = _ring_fwd_loop(q, k, v, kv_mask, causal, axis_name)
    return out, (q, k, v, kv_mask, out, lse)


def _ring_vjp_bwd(causal, axis_name, res, g):
    q, k, v, kv_mask, out, lse = res
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    B, S, H, D = q.shape

    def flat(x):
        return x.reshape(B, x.shape[1], H * D)   # metadata-only

    qf = flat(q)
    dof = flat(g).astype(jnp.float32)
    outf = flat(out).astype(jnp.float32)
    lsef = lse                                    # (B, H, S)
    delta = _flash_delta(dof, outf, H)            # (B, H, S)

    def grads_for_block(kbf, vbf, mbf, block_causal):
        Sq_l, Skv_l = qf.shape[1], kbf.shape[1]
        if _fused_eligible(Sq_l, Skv_l, None, None):
            dq, dk, dv = _bwd_fused_call(qf, kbf, vbf, mbf,
                                         dof.astype(qf.dtype), lsef, delta,
                                         block_causal, None, None, H)
        else:
            dq = _dq_call(qf, kbf, vbf, mbf, dof.astype(qf.dtype), lsef,
                          delta, block_causal, None, None, H)
            dk, dv = _dkv_call(qf, kbf, vbf, mbf, dof.astype(qf.dtype), lsef,
                               delta, block_causal, None, None, H)
        return (dq.astype(jnp.float32), dk.astype(jnp.float32),
                dv.astype(jnp.float32))

    def step(carry, i):
        dq, dkb, dvb, kb, vb, mb = carry
        src_shard = (my - i) % n
        visible = jnp.logical_or(jnp.logical_not(causal), src_shard <= my)
        diagonal = src_shard == my
        kbf = flat(kb)
        vbf = flat(vb)
        mbf = mb.astype(jnp.int32)[:, None, :]

        def compute(_):
            if causal:
                dq_i, dk_i, dv_i = jax.lax.cond(
                    diagonal,
                    lambda _: grads_for_block(kbf, vbf, mbf, True),
                    lambda _: grads_for_block(kbf, vbf, mbf, False),
                    None)
            else:
                dq_i, dk_i, dv_i = grads_for_block(kbf, vbf, mbf, False)

            def unflat(x):
                return x.reshape(B, S, H, D)      # metadata-only

            return (dq + unflat(dq_i), dkb + unflat(dk_i),
                    dvb + unflat(dv_i))

        dq, dkb, dvb = jax.lax.cond(
            visible, compute, lambda _: (dq, dkb, dvb), None)
        # grads travel WITH their k/v blocks; after n rotations they are home
        perm = _ring_perm(n)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        dkb = jax.lax.ppermute(dkb, axis_name, perm)
        dvb = jax.lax.ppermute(dvb, axis_name, perm)
        return (dq, dkb, dvb, kb, vb, mb), None

    zeros = jnp.zeros((B, S, H, D), jnp.float32)
    (dq, dk, dv, *_), _ = jax.lax.scan(
        step, (zeros, zeros, zeros, k, v, kv_mask), jnp.arange(n))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


ring_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_attention_sharded(q, k, v, kv_mask=None, causal: bool = False,
                           mesh=None, axis_name: str = "sp"):
    """shard_map wrapper: q/k/v (B, S, H, D) sharded on S over ``axis_name``."""
    from jax.sharding import PartitionSpec as P
    assert mesh is not None
    spec = P(None, axis_name, None, None)
    mspec = P(None, axis_name)
    if kv_mask is None:
        kv_mask = jnp.ones(q.shape[:2], jnp.float32)
    fn = functools.partial(ring_attention, causal=causal, axis_name=axis_name)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, spec, spec, mspec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, kv_mask)
