"""Ring attention over a sequence-parallel mesh axis (prototype).

Long-context extension beyond the reference's offline chunking (SURVEY §5:
the reference caps sequences at 1024 and splits songs offline;
runtime sequence scaling is the framework's long-context answer).

Each ``sp`` shard holds a sequence slice of q/k/v.  K/V (+ key mask) rotate
around the ring via ``ppermute``; every step computes a LOCAL flash
attention block (our pallas kernel, which returns the row log-sum-exp) and
the partial outputs merge with the online-softmax identity::

    lse = logaddexp(lse_a, lse_b)
    out = out_a * exp(lse_a - lse) + out_b * exp(lse_b - lse)

Causality across shards is handled at block granularity: a whole k/v block
strictly in the future is skipped; the diagonal block uses the kernel's
causal mask with the correct global offset.  Forward-only for now (wire
into training needs the matching ring backward) — used for sharded
inference/scoring and as the round-2 basis for fully sequence-parallel
training.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .flash import _fwd as _flash_fwd

__all__ = ["ring_attention", "ring_attention_sharded"]


def _local_flash(q, k, v, kv_mask, causal):
    """Local flash block returning (out (B,S,H,D), lse (B,H,S))."""
    B, Sq, H, D = q.shape
    out, lse, _ = _flash_fwd(q, k, v, kv_mask, causal, None, None)
    return (out.reshape(B, H, Sq, D).transpose(0, 2, 1, 3),
            lse.reshape(B, H, Sq))


def _merge(out_a, lse_a, out_b, lse_b):
    lse = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse)[..., None].transpose(0, 2, 1, 3)
    wb = jnp.exp(lse_b - lse)[..., None].transpose(0, 2, 1, 3)
    return (out_a.astype(jnp.float32) * wa
            + out_b.astype(jnp.float32) * wb), lse


def ring_attention(q, k, v, kv_mask=None, causal: bool = False,
                   axis_name: str = "sp"):
    """Flash attention where q/k/v are sharded on ``axis_name`` (seq axis).

    Call inside ``shard_map`` (or use :func:`ring_attention_sharded`).
    Layout (B, S_local, H, D); returns the same.
    """
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    B, S, H, D = q.shape
    if kv_mask is None:
        kv_mask = jnp.ones((B, S), jnp.float32)

    def step(carry, i):
        out, lse, kb, vb, mb = carry
        src_shard = (my - i) % n          # whose keys we hold this step
        visible = jnp.logical_or(jnp.logical_not(causal), src_shard <= my)
        diagonal = src_shard == my

        def compute(_):
            # diagonal block: in-kernel causal mask; earlier blocks: full
            o_d, l_d = _local_flash(q, kb, vb, mb, True)
            o_f, l_f = _local_flash(q, kb, vb, mb, False)
            o_i = jnp.where(diagonal, o_d.astype(jnp.float32),
                            o_f.astype(jnp.float32)) if causal else \
                o_f.astype(jnp.float32)
            l_i = (jnp.where(diagonal, l_d, l_f) if causal else l_f)
            return _merge(out, lse, o_i, l_i)

        out, lse = jax.lax.cond(
            visible, compute, lambda _: (out, lse), None)
        perm = [(j, (j + 1) % n) for j in range(n)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        return (out, lse, kb, vb, mb), None

    out0 = jnp.zeros((B, S, H, D), jnp.float32)
    lse0 = jnp.full((B, H, S), -jnp.inf, jnp.float32)
    (out, lse, *_), _ = jax.lax.scan(
        step, (out0, lse0, k, v, kv_mask), jnp.arange(n))
    return out.astype(q.dtype)


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
