"""Flash attention for TPU — pianobart_tpu's own pallas kernels.

Blockwise online-softmax attention (FlashAttention-2 schedule) so the
(S, S) score matrix never leaves VMEM: without this, the full PianoBART
train step OOMs a 16 GB v5e chip (24 × 512 MB f32 score buffers in the XLA
backward — measured, see ops/attention.py).

Layout — H-in-lanes: the public API is ``q, k, v : (B, S, H, D)`` (D = head
dim, lane-aligned 128), but internally tensors are viewed as ``(B, S, H*D)``
— a pure metadata reshape — and each head is a static 128-wide *lane slice*
selected by the BlockSpec index map over a ``(B, H, nQ, nKV)`` grid.  The
previous layout flattened to ``(B*H, S, D)`` via a real ``(B,S,H,D) →
(B,H,S,D)`` transpose, which cost ~29 ms/step of pure data movement in the
full train step (measured via xprof); this layout has zero transposes
anywhere on the attention path.  Row statistics (lse) live as ``(B, H, S)``.

MXU operands are upcast to f32 (accumulation f32 via
``preferred_element_type``).  The round-3 operand-dtype experiments
(full-bf16 / mixed / precision=DEFAULT score dots) are all settled
negatives or no-ops and their env flags have been removed — see the
tombstone comment above the module constants below.  Measured on v5e, the
H-in-lanes layout beats the transpose-based one 2.82 vs 3.52 ms/module
forward and 407.7 vs 424.0 ms on the full-model fwd+bwd probe
(scripts/perf_probe.py).

Backward follows the FlashAttention-2 recipe.  When the whole sequence fits
one block per grid step (the flagship S=1024 workload and ring shards) a
single fused kernel produces dQ, dK and dV computing S, P, dS exactly once;
otherwise two kernels:

* ``dq``  — per q block, sweep kv blocks:  dS = P ∘ (dO Vᵀ − Δ),
  dQ += dS·K with P recomputed from the saved row logsumexp L;
* ``dkv`` — per kv block, sweep q blocks:  dV += Pᵀ dO, dK += dSᵀ Q.

All accumulation in f32 scratch; inputs/outputs keep the model dtype.
Runs in interpret mode off-TPU so the same kernels are unit-tested on CPU.

Fully-masked rows (every key hidden by pad+causal masks) output an
arbitrary convex combination of v that depends on the block size — same as
XLA softmax-of-all-NEG_INF rows, and excluded by every loss mask downstream;
do not rely on their values.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# TOMBSTONE — MXU operand-dtype experiments (round 3, full story in
# ROADMAP.md §3 and scripts/scoreprec_tpu_check.py).  The whole
# BF16 / MIXED / SCOREPREC lever family is dead and the env flags that
# used to drive it (PBX_FLASH_BF16 / PBX_FLASH_MIXED / PBX_FLASH_SCOREPREC)
# are deliberately NOT read anymore:
#   * full-bf16 operands: measured SLOWER on v5e (kernels are VPU-bound;
#     the extra (S,S) cast passes cost more than the MXU passes saved —
#     attn fwd+bwd 11.0 vs 8.6 ms/module at B=32, S=1024);
#   * MIXED (bf16 only for the HBM-natural Q·Kᵀ / dO·Vᵀ dots):
#     compile-PATHOLOGICAL on the shared serial remote compile helper
#     (>55 min, wedging every subsequent compile on the machine) — this is
#     why the flag is quarantined rather than merely documented;
#   * SCOREPREC default/all: proven a BITWISE NO-OP on chip — jax's
#     default matmul precision is already Precision.DEFAULT on TPU and
#     applies inside pallas, so the committed f32 dots were always single
#     bf16 MXU passes with P/dS truncated in the MXU pipeline.
# The module globals below are retained (as constants) only so the
# numerics tests in tests/test_flash.py can monkeypatch the alternate
# operand paths and pin their equivalence to the committed path.
_BF16_OPERANDS = False
_MIXED_OPERANDS = False
_SCORE_PREC = ""
_SCORE_PREC_DEFAULT = False
_ALL_PREC_DEFAULT = False


def _mxu_in(x):
    """Operand of a dot whose counterpart is an f32 (S,S) intermediate."""
    if _BF16_OPERANDS:
        return x
    return x.astype(jnp.float32)


def _score_in(x):
    """Operand of the S = Q·Kᵀ / dP = dO·Vᵀ dots (both sides HBM-natural).

    Under MIXED (or full-BF16) these stay in the model dtype: both sides
    are already bf16, so the MXU takes them in one pass with no casts.
    """
    if _BF16_OPERANDS or _MIXED_OPERANDS:
        return x
    return x.astype(jnp.float32)


def _score_dot(a, b, contract):
    """The S = Q·Kᵀ / dP = dO·Vᵀ dots — the two whose operands are
    HBM-natural bf16 values.  One place so the operand-dtype (BF16/MIXED)
    and dot-precision (SCOREPREC) experiments stay consistent across the
    fwd, dq, dkv and fused-bwd kernels."""
    kw = {}
    if _SCORE_PREC_DEFAULT:
        kw["precision"] = jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        _score_in(a), _score_in(b), (contract, ((), ())),
        preferred_element_type=jnp.float32, **kw)


def _p_for_dot(p, other_dtype):
    if _BF16_OPERANDS:
        return p.astype(other_dtype)
    return p


def _acc_dot(p_or_ds, other, contract):
    """The dots whose LHS is an f32 (S,S) intermediate (P or dS):
    P·V, dS·K, Pᵀ·dO, dSᵀ·Q.  Under SCOREPREC=all they run at
    precision=DEFAULT (P/dS truncated to bf16 inside the MXU pipeline,
    no explicit cast pass — the standard FlashAttention approximation);
    otherwise operand handling follows the BF16/committed paths."""
    other = _mxu_in(other)
    kw = {}
    if _ALL_PREC_DEFAULT:
        kw["precision"] = jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        _p_for_dot(p_or_ds, other.dtype), other, (contract, ((), ())),
        preferred_element_type=jnp.float32, **kw)

# Measured on v5e (B=32, S=1024, H=8, D=128): 1024x1024 blocks are ~25%
# faster forward than 512x512 (single-pass softmax, no cross-block rescale);
# backward also takes 1024 blocks (sweep: 4.8 vs 5.2 ms causal fwd+bwd).
DEFAULT_BLOCK_Q = None      # resolved per call: min(1024, S)
DEFAULT_BLOCK_KV = None
_FWD_BLOCK = 1024
_BWD_BLOCK = 1024


def _resolve(block, cap, size):
    """Largest block <= min(block or cap, size) that divides ``size``.

    The kernels tile the sequence with ``size // block`` blocks and no tail
    handling; a non-divisor block would silently drop the tail (rows past the
    last full block came out uninitialized — found by the round-1 advisor).
    Lane alignment (128) is required for the grid to map onto the MXU/VPU.
    """
    lane = 128 if not _interpret() else 1
    if size % lane != 0:
        raise ValueError(
            f"flash kernels need a {lane}-multiple sequence length, got {size}")
    b = min(block if block is not None else cap, size)
    b -= b % lane
    while size % b:
        b -= lane
    return b


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _view_flat(x):
    """(B, S, H, D) -> (B, S, H*D): contiguous, metadata-only."""
    B, S, H, D = x.shape
    return x.reshape(B, S, H * D)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref,   # inputs
                o_ref, lse_ref,                  # outputs
                acc_ref, m_ref, l_ref,           # scratch
                *, causal: bool, block_q: int, block_kv: int):
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ikv == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # causal: q block iq only attends kv blocks with start <= q end
    run = True
    if causal:
        run = ikv * block_kv <= (iq + 1) * block_q - 1

    @pl.when(run)
    def _compute():
        s = _score_dot(q_ref[0], k_ref[0], ((1,), (1,)))    # (Bq, Bkv)
        mask = mask_ref[0, 0] != 0                          # (Bkv,)
        s = jnp.where(mask[None, :], s, NEG_INF)
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            cols = ikv * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)

        m_prev = m_ref[...]                                 # (Bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                              # (Bq, Bkv) f32
        corr = jnp.exp(m_prev - m_new)                      # (Bq, 1)
        l_ref[...] = l_ref[...] * corr + p.sum(axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * corr + _acc_dot(
            p, v_ref[0], ((1,), (0,)))
        m_ref[...] = m_new

    @pl.when(ikv == n_kv - 1)
    def _finish():
        l = l_ref[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, 0] = (m_ref[...] + jnp.log(l_safe))[:, 0]


def _fwd(q, k, v, kv_mask, causal, block_q, block_kv):
    """Internal flash forward.

    Accepts (B, S, H, D); returns ``out (B, Sq, H*D)``, ``lse (B, H, Sq)``
    and the flat residuals — no transposes, only free reshapes.
    """
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    block_q = _resolve(block_q, _FWD_BLOCK, Sq)
    block_kv = _resolve(block_kv, _FWD_BLOCK, Skv)
    qf, kf, vf = _view_flat(q), _view_flat(k), _view_flat(v)
    if kv_mask is None:
        maskf = jnp.ones((B, 1, Skv), jnp.int32)
    else:
        maskf = kv_mask.astype(jnp.int32)[:, None, :]        # (B, 1, Skv)

    nq = Sq // block_q
    nkv = Skv // block_kv
    grid = (B, H, nq, nkv)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, causal=causal,
                          block_q=block_q, block_kv=block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_kv), lambda b, h, iq, ikv: (b, 0, ikv)),
            pl.BlockSpec((1, block_q, D), lambda b, h, iq, ikv: (b, iq, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, iq, ikv: (b, ikv, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, iq, ikv: (b, ikv, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, h, iq, ikv: (b, iq, h)),
            # unit third dim keeps the (sublane, lane) block = (1, block_q)
            # legal: sublane block equals the full array dim
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, iq, ikv: (b, h, 0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, H * D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(maskf, qf, kf, vf)
    return out, lse.reshape(B, H, Sq), (qf, kf, vf, maskf)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_acc,
               *, causal: bool, block_q: int, block_kv: int):
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ikv == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = True
    if causal:
        run = ikv * block_kv <= (iq + 1) * block_q - 1

    @pl.when(run)
    def _compute():
        s = _score_dot(q_ref[0], k_ref[0], ((1,), (1,)))
        mask = mask_ref[0, 0] != 0
        s = jnp.where(mask[None, :], s, NEG_INF)
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            cols = ikv * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, 0, 0][:, None])              # (Bq, Bkv) f32
        dp = _score_dot(do_ref[0], v_ref[0], ((1,), (1,)))
        ds = p * (dp - delta_ref[0, 0, 0][:, None])
        dq_acc[...] += _acc_dot(ds, k_ref[0], ((1,), (0,)))

    @pl.when(ikv == n_kv - 1)
    def _finish():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, causal: bool, block_q: int, block_kv: int):
    ikv = pl.program_id(2)
    iq = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = True
    if causal:
        run = ikv * block_kv <= (iq + 1) * block_q - 1

    @pl.when(run)
    def _compute():
        s = _score_dot(q_ref[0], k_ref[0], ((1,), (1,)))
        mask = mask_ref[0, 0] != 0
        s = jnp.where(mask[None, :], s, NEG_INF)
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            cols = ikv * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, 0, 0][:, None])              # (Bq, Bkv) f32
        dv_acc[...] += _acc_dot(p, do_ref[0], ((0,), (0,)))
        dp = _score_dot(do_ref[0], v_ref[0], ((1,), (1,)))
        ds = p * (dp - delta_ref[0, 0, 0][:, None])             # (Bq, Bkv)
        dk_acc[...] += _acc_dot(ds, q_ref[0], ((0,), (0,)))

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, dk_ref, dv_ref,
                      *, causal: bool, block_q: int, block_kv: int):
    """Single-block fused backward: dQ, dK, dV in ONE kernel.

    Computes S, P, dP, dS exactly once per (q, kv) pair — the two-kernel
    schedule (``_dq_kernel`` + ``_dkv_kernel``) recomputes them twice and
    re-reads q/k/v/do from HBM twice.  Used when the whole sequence fits one
    block per grid step (the flagship S=1024 workload and ring shards);
    multi-block shapes fall back to the two-kernel path, whose accumulator
    lifetimes don't fit a single grid order.
    """
    s = _score_dot(q_ref[0], k_ref[0], ((1,), (1,)))
    mask = mask_ref[0, 0] != 0
    s = jnp.where(mask[None, :], s, NEG_INF)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
        s = jnp.where(rows >= cols, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0, 0][:, None])                 # (Bq, Bkv) f32
    dv_ref[0] = _acc_dot(p, do_ref[0],
                         ((0,), (0,))).astype(dv_ref.dtype)
    dp = _score_dot(do_ref[0], v_ref[0], ((1,), (1,)))
    ds = p * (dp - delta_ref[0, 0, 0][:, None])
    dq_ref[0] = _acc_dot(ds, k_ref[0],
                         ((1,), (0,))).astype(dq_ref.dtype)
    dk_ref[0] = _acc_dot(ds, q_ref[0],
                         ((0,), (0,))).astype(dk_ref.dtype)


def _bwd_fused_call(qf, kf, vf, maskf, dof, lse, delta, causal,
                    block_q, block_kv, H):
    """Fused dQ/dK/dV when Sq and Skv each fit one block.

    Flat layout: ``qf (B, Sq, H*D)``, ``lse/delta (B, H, Sq)``.
    """
    B, Sq, HD = qf.shape
    D = HD // H
    Skv = kf.shape[1]
    lse4 = lse.reshape(B, H, 1, Sq)
    delta4 = delta.reshape(B, H, 1, Sq)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, causal=causal, block_q=Sq,
                          block_kv=Skv),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Skv), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, Sq, D), lambda b, h: (b, 0, h)),
            pl.BlockSpec((1, Skv, D), lambda b, h: (b, 0, h)),
            pl.BlockSpec((1, Skv, D), lambda b, h: (b, 0, h)),
            pl.BlockSpec((1, Sq, D), lambda b, h: (b, 0, h)),
            pl.BlockSpec((1, 1, 1, Sq), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Sq), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Sq, D), lambda b, h: (b, 0, h)),
            pl.BlockSpec((1, Skv, D), lambda b, h: (b, 0, h)),
            pl.BlockSpec((1, Skv, D), lambda b, h: (b, 0, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, HD), qf.dtype),
            jax.ShapeDtypeStruct((B, Skv, HD), kf.dtype),
            jax.ShapeDtypeStruct((B, Skv, HD), vf.dtype),
        ],
        interpret=_interpret(),
    )(maskf, qf, kf, vf, dof, lse4, delta4)
    return dq, dk, dv


def _fused_eligible(Sq, Skv, block_q, block_kv) -> bool:
    bq = _resolve(block_q, _BWD_BLOCK, Sq)
    bkv = _resolve(block_kv, _BWD_BLOCK, Skv)
    return bq == Sq and bkv == Skv


def _dq_call(qf, kf, vf, maskf, dof, lse, delta, causal, block_q, block_kv, H):
    """dQ in the flat (B, S, H*D) layout given (B, H, S) row lse/delta."""
    B, Sq, HD = qf.shape
    D = HD // H
    Skv = kf.shape[1]
    block_q = _resolve(block_q, _BWD_BLOCK, Sq)
    block_kv = _resolve(block_kv, _BWD_BLOCK, Skv)
    nq = Sq // block_q
    nkv = Skv // block_kv
    lse4 = lse.reshape(B, H, 1, Sq)
    delta4 = delta.reshape(B, H, 1, Sq)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, causal=causal, block_q=block_q,
                          block_kv=block_kv),
        grid=(B, H, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, block_kv), lambda b, h, iq, ikv: (b, 0, ikv)),
            pl.BlockSpec((1, block_q, D), lambda b, h, iq, ikv: (b, iq, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, iq, ikv: (b, ikv, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, iq, ikv: (b, ikv, h)),
            pl.BlockSpec((1, block_q, D), lambda b, h, iq, ikv: (b, iq, h)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, iq, ikv: (b, h, 0, iq)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, iq, ikv: (b, h, 0, iq)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D),
                               lambda b, h, iq, ikv: (b, iq, h)),
        out_shape=jax.ShapeDtypeStruct((B, Sq, HD), qf.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=_interpret(),
    )(maskf, qf, kf, vf, dof, lse4, delta4)
    return dq


def _dkv_call(qf, kf, vf, maskf, dof, lse, delta, causal, block_q, block_kv,
              H):
    """dK, dV in the flat (B, S, H*D) layout given (B, H, S) row lse/delta."""
    B, Sq, HD = qf.shape
    D = HD // H
    Skv = kf.shape[1]
    block_q = _resolve(block_q, _BWD_BLOCK, Sq)
    block_kv = _resolve(block_kv, _BWD_BLOCK, Skv)
    nq = Sq // block_q
    nkv = Skv // block_kv
    lse4 = lse.reshape(B, H, 1, Sq)
    delta4 = delta.reshape(B, H, 1, Sq)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, causal=causal, block_q=block_q,
                          block_kv=block_kv),
        grid=(B, H, nkv, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_kv), lambda b, h, ikv, iq: (b, 0, ikv)),
            pl.BlockSpec((1, block_q, D), lambda b, h, ikv, iq: (b, iq, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, ikv, iq: (b, ikv, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, ikv, iq: (b, ikv, h)),
            pl.BlockSpec((1, block_q, D), lambda b, h, ikv, iq: (b, iq, h)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, ikv, iq: (b, h, 0, iq)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, ikv, iq: (b, h, 0, iq)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, D), lambda b, h, ikv, iq: (b, ikv, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, ikv, iq: (b, ikv, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Skv, HD), kf.dtype),
            jax.ShapeDtypeStruct((B, Skv, HD), vf.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_kv, D), jnp.float32),
                        pltpu.VMEM((block_kv, D), jnp.float32)],
        interpret=_interpret(),
    )(maskf, qf, kf, vf, dof, lse4, delta4)
    return dk, dv


def _delta(dof, out, H):
    """Δ_i = rowsum(dO ∘ O) per head: (B, S, H*D) pair -> (B, H, S)."""
    B, S, HD = dof.shape
    d = (dof.astype(jnp.float32) * out.astype(jnp.float32))
    return d.reshape(B, S, H, HD // H).sum(-1).transpose(0, 2, 1)


def _bwd_impl(causal, block_q, block_kv, res, g):
    qf, kf, vf, maskf, out, lse, shapes = res
    B, Sq, H, D = shapes
    Skv = kf.shape[1]
    dof = _view_flat(g)                                      # (B, Sq, H*D)
    delta = _delta(dof, out, H)                              # (B, H, Sq)

    if _fused_eligible(Sq, Skv, block_q, block_kv):
        dq, dk, dv = _bwd_fused_call(qf, kf, vf, maskf, dof, lse, delta,
                                     causal, block_q, block_kv, H)
    else:
        dq = _dq_call(qf, kf, vf, maskf, dof, lse, delta, causal,
                      block_q, block_kv, H)
        dk, dv = _dkv_call(qf, kf, vf, maskf, dof, lse, delta, causal,
                           block_q, block_kv, H)

    def unflat(x, S):
        return x.reshape(B, S, H, D)

    return unflat(dq, Sq), unflat(dk, Skv), unflat(dv, Skv), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, kv_mask=None,
                    causal: bool = False,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_kv: int = DEFAULT_BLOCK_KV):
    """Flash attention over (B, S, H, D); q pre-scaled by the caller."""
    out, _, _ = _fwd(q, k, v, kv_mask, causal, block_q, block_kv)
    B, Sq, H, D = q.shape
    return out.reshape(B, Sq, H, D)


def _vjp_fwd(q, k, v, kv_mask, causal, block_q, block_kv):
    out, lse, (qf, kf, vf, maskf) = _fwd(q, k, v, kv_mask, causal,
                                         block_q, block_kv)
    B, Sq, H, D = q.shape
    res = (qf, kf, vf, maskf, out, lse, (B, Sq, H, D))
    return out.reshape(B, Sq, H, D), res


def _vjp_bwd(causal, block_q, block_kv, res, g):
    return _bwd_impl(causal, block_q, block_kv, res, g)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
