"""Kernel experiment lab: flash-forward variants, measured head-to-head.

Every variant is correctness-checked against the committed kernel before
timing.  ``main()`` measures the committed kernel vs the exp2-domain
softmax variants; set ``PBX_LAB_KT=1`` to also measure the
pre-transposed-kT variants.  Recorded verdicts (v5e, B=32, S=1024,
interleaved medians — see ROADMAP.md):

  base (H-in-lanes, f32 operands)  2.97-3.00 ms/module   <- committed
  hl_exp2 (exp2-domain softmax)    2.92-3.24 (noise; ~5% on causal only)
  kt_f32  (k pre-transposed)       +5%  — the XLA transpose costs more
  kt_bf16 (bf16 MXU operands)      +60% — cast passes dominate
  causal 512-blocks                2x slower than 1024

Usage: python scripts/kernel_lab.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _interpret():
    return jax.default_backend() != "tpu"


def _kt_fwd_kernel(mask_ref, q_ref, kt_ref, v_ref, o_ref, lse_ref,
                   acc_ref, m_ref, l_ref,
                   *, causal, block_q, block_kv, upcast, exp2):
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ikv == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    run = True
    if causal:
        run = ikv * block_kv <= (iq + 1) * block_q - 1

    @pl.when(run)
    def _compute():
        q = q_ref[0]
        kt = kt_ref[0]                                     # (D, Bkv)
        if upcast:
            q = q.astype(jnp.float32)
            kt = kt.astype(jnp.float32)
        if exp2:
            q = q * jnp.asarray(LOG2E, q.dtype)
        s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = mask_ref[0, 0] != 0
        s = jnp.where(mask[None, :], s, NEG_INF)
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            cols = ikv * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        e = jnp.exp2 if exp2 else jnp.exp
        p = e(s - m_new)
        corr = e(m_prev - m_new)
        l_ref[...] = l_ref[...] * corr + p.sum(axis=1, keepdims=True)
        v = v_ref[0]
        if upcast:
            v = v.astype(jnp.float32)
        acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(ikv == n_kv - 1)
    def _finish():
        l = l_ref[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lg = jnp.log2(l_safe) if exp2 else jnp.log(l_safe)
        lse_ref[0, 0, 0] = (m_ref[...] + lg)[:, 0]


def kt_fwd(q, k, v, kv_mask, causal=False, upcast=True, exp2=False,
           block=1024):
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    block_q = min(block, Sq)
    block_kv = min(block, Skv)
    qf = q.reshape(B, Sq, H * D)
    kt = jnp.swapaxes(k.reshape(B, Skv, H * D), 1, 2)   # (B, HD, Skv) REAL
    vf = v.reshape(B, Skv, H * D)
    maskf = (jnp.ones((B, 1, Skv), jnp.int32) if kv_mask is None
             else kv_mask.astype(jnp.int32)[:, None, :])
    grid = (B, H, Sq // block_q, Skv // block_kv)
    out, lse = pl.pallas_call(
        functools.partial(_kt_fwd_kernel, causal=causal, block_q=block_q,
                          block_kv=block_kv, upcast=upcast, exp2=exp2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_kv), lambda b, h, iq, ikv: (b, 0, ikv)),
            pl.BlockSpec((1, block_q, D), lambda b, h, iq, ikv: (b, iq, h)),
            pl.BlockSpec((1, D, block_kv), lambda b, h, iq, ikv: (b, h, ikv)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, iq, ikv: (b, ikv, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, h, iq, ikv: (b, iq, h)),
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda b, h, iq, ikv: (b, h, 0, iq)),
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
    )(maskf, qf, kt, vf)
    return out.reshape(B, Sq, H, D)


def hl_fwd(q, k, v, kv_mask, causal=False, exp2=True, block=1024):
    """Committed H-in-lanes layout, optional exp2-domain softmax."""
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    block_q = min(block, Sq)
    block_kv = min(block, Skv)
    qf = q.reshape(B, Sq, H * D)
    kf = k.reshape(B, Skv, H * D)
    vf = v.reshape(B, Skv, H * D)
    maskf = (jnp.ones((B, 1, Skv), jnp.int32) if kv_mask is None
             else kv_mask.astype(jnp.int32)[:, None, :])

    def kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
               acc_ref, m_ref, l_ref):
        iq = pl.program_id(2)
        ikv = pl.program_id(3)
        n_kv = pl.num_programs(3)

        @pl.when(ikv == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        run = True
        if causal:
            run = ikv * block_kv <= (iq + 1) * block_q - 1

        @pl.when(run)
        def _compute():
            qq = q_ref[0].astype(jnp.float32)
            if exp2:
                qq = qq * jnp.float32(LOG2E)
            kk = k_ref[0].astype(jnp.float32)
            s = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            mask = mask_ref[0, 0] != 0
            s = jnp.where(mask[None, :], s, NEG_INF)
            if causal:
                rows = iq * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 0)
                cols = ikv * block_kv + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 1)
                s = jnp.where(rows >= cols, s, NEG_INF)
            m_prev = m_ref[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            e = jnp.exp2 if exp2 else jnp.exp
            p = e(s - m_new)
            corr = e(m_prev - m_new)
            l_ref[...] = l_ref[...] * corr + p.sum(axis=1, keepdims=True)
            v_ = v_ref[0].astype(jnp.float32)
            acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
                p, v_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[...] = m_new

        @pl.when(ikv == n_kv - 1)
        def _finish():
            l = l_ref[...]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
            lg = jnp.log2(l_safe) if exp2 else jnp.log(l_safe)
            lse_ref[0, 0, 0] = (m_ref[...] + lg)[:, 0]

    grid = (B, H, Sq // block_q, Skv // block_kv)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_kv), lambda b, h, iq, ikv: (b, 0, ikv)),
            pl.BlockSpec((1, block_q, D), lambda b, h, iq, ikv: (b, iq, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, iq, ikv: (b, ikv, h)),
            pl.BlockSpec((1, block_kv, D), lambda b, h, iq, ikv: (b, ikv, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, h, iq, ikv: (b, iq, h)),
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda b, h, iq, ikv: (b, h, 0, iq)),
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
    return out.reshape(B, Sq, H, D)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from pianobart_tpu.ops.flash import flash_attention

    B, S, H, D = 32, 1024, 8, 128
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, S, H, D), jnp.bfloat16) * 0.1
    mask = jnp.ones((B, S))

    # correctness vs committed kernel (bf16 tolerance)
    ref = flash_attention(q, q, q, mask, False)
    checks = {"hl_exp2": lambda: hl_fwd(q, q, q, mask, False, exp2=True)}
    if os.environ.get("PBX_LAB_KT") == "1":
        checks.update({
            "kt_f32": lambda: kt_fwd(q, q, q, mask, False, upcast=True),
            "kt_bf16": lambda: kt_fwd(q, q, q, mask, False, upcast=False),
            "kt_bf16_exp2": lambda: kt_fwd(q, q, q, mask, False,
                                           upcast=False, exp2=True),
        })
    for name, fn in checks.items():
        out = fn()
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{name}: max|diff| vs committed = {err:.5f}", flush=True)
        assert err < 0.05, err

    def measure(fn, reps=10):
        y = fn()
        _ = float(y)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(fn())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]   # median: robust to tunnel hiccups

    @jax.jit
    def noop(x):
        return x + 1.0
    rtt = measure(lambda: noop(jnp.float32(0)), reps=8)
    print(f"rtt       {rtt * 1e3:8.2f} ms", flush=True)

    def chain(att):
        @jax.jit
        def f(x):
            def body(c, _):
                o = att(c)
                return (o * 0.5 + c * 0.5).astype(c.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=24)
            return y.astype(jnp.float32).sum()
        return lambda: f(q)

    variants = {
        "base":           lambda c: flash_attention(c, c, c, mask, False),
        "hl_exp2":        lambda c: hl_fwd(c, c, c, mask, False, exp2=True),
        "hl_noexp2":      lambda c: hl_fwd(c, c, c, mask, False, exp2=False),
        "base_causal":    lambda c: flash_attention(c, c, c, mask, True),
        "hl_exp2_causal": lambda c: hl_fwd(c, c, c, mask, True, exp2=True),
    }
    if os.environ.get("PBX_LAB_KT") == "1":
        variants.update({
            "kt_f32":  lambda c: kt_fwd(c, c, c, mask, False, upcast=True),
            "kt_bf16": lambda c: kt_fwd(c, c, c, mask, False, upcast=False),
            "kt_bf16_causal_b512": lambda c: kt_fwd(c, c, c, mask, True,
                                                    upcast=False, block=512),
        })
    fns = {name: chain(att) for name, att in variants.items()}
    for sweep in range(2):                 # interleave: expose drift
        for name, f in fns.items():
            t = measure(f) - rtt
            print(f"[{sweep}] {name:22s} {t * 1e3:8.2f} ms"
                  f" ({t / 24 * 1e3:.2f} ms/module)", flush=True)


if __name__ == "__main__":
    main()
