"""Our pallas flash-attention kernels vs the XLA reference (interpret mode).

Validates forward outputs AND custom-VJP gradients (dq, dk, dv) for all
mask/causal combinations on CPU via pallas interpret mode — the same kernel
code that runs compiled on TPU.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu.ops.attention import _xla_attention
from pianobart_tpu.ops.flash import flash_attention

B, S, H, D = 2, 256, 2, 128
BLK = 128


def setup(seed=0, Skv=S):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, S, H, D), jnp.float32) * 0.3
    k = jax.random.normal(k2, (B, Skv, H, D), jnp.float32) * 0.3
    v = jax.random.normal(k3, (B, Skv, H, D), jnp.float32)
    mask = jnp.ones((B, Skv))
    mask = mask.at[1, Skv - 40:].set(0.0)
    return q, k, v, mask


def ref(q, k, v, mask, causal):
    return _xla_attention(q, k, v, mask, causal, None, 0.0, True, None)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("use_mask", [False, True])
def test_forward_matches_xla(causal, use_mask):
    q, k, v, mask = setup()
    m = mask if use_mask else None
    out = flash_attention(q, k, v, m, causal, BLK, BLK)
    expect = ref(q, k, v, m, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_xla(causal):
    q, k, v, mask = setup(seed=1)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, causal, BLK, BLK)
        return (o * jnp.cos(o)).sum()

    def loss_ref(q, k, v):
        o = ref(q, k, v, mask, causal)
        return (o * jnp.cos(o)).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{name} mismatch (causal={causal})")


@pytest.mark.parametrize("causal", [False, True])
def test_fused_backward_matches_xla(causal):
    """Default blocks at S=256 resolve to one block per grid step, which
    routes through the single fused dq/dk/dv backward kernel."""
    from pianobart_tpu.ops.flash import _fused_eligible
    assert _fused_eligible(S, S, None, None)
    q, k, v, mask = setup(seed=5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, causal)   # default blocks
        return (o * jnp.cos(o)).sum()

    def loss_ref(q, k, v):
        o = ref(q, k, v, mask, causal)
        return (o * jnp.cos(o)).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{name} mismatch (causal={causal})")


def test_cross_attention_rectangular():
    # decoder->encoder cross attention with Skv != Sq
    q, k, v, mask = setup(seed=2, Skv=384)
    out = flash_attention(q, k, v, mask, False, BLK, BLK)
    expect = ref(q, k, v, mask, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs():
    q, k, v, mask = setup(seed=3)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, mask, True, BLK, BLK)
    expect = ref(qb, kb, vb, mask, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expect, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_fully_padded_query_rows_are_finite():
    q, k, v, _ = setup(seed=4)
    mask = jnp.ones((B, S)).at[0, :].set(0.0)  # one sample fully masked
    out = flash_attention(q, k, v, mask, False, BLK, BLK)
    assert bool(jnp.isfinite(out).all())


def test_bf16_operand_switch(monkeypatch):
    """PBX_FLASH_BF16 path (raw bf16 MXU operands): forward AND gradients
    must still match the XLA reference.  The flag is read once at import, so
    the test toggles the module global directly."""
    from pianobart_tpu.ops import flash as flash_mod
    monkeypatch.setattr(flash_mod, "_BF16_OPERANDS", True)
    monkeypatch.setenv("PBX_FLASH_BF16", "1")  # keep freeze-warning quiet
    q, k, v, mask = setup(seed=4)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    out = flash_mod.flash_attention(qb, kb, vb, mask, True, BLK, BLK)
    expect = ref(qb, kb, vb, mask, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expect, np.float32),
                               rtol=3e-2, atol=3e-2)

    def loss_flash(q_, k_, v_):
        o = flash_mod.flash_attention(q_, k_, v_, mask, True, BLK, BLK)
        return (o.astype(jnp.float32) ** 2).sum()

    def loss_ref(q_, k_, v_):
        o = ref(q_, k_, v_, mask, True)
        return (o.astype(jnp.float32) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qb, kb, vb)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1.5e-1, atol=1.5e-1,
                                   err_msg=f"d{name} mismatch (bf16 operands)")

    # Pin the flag path to the COMMITTED f32-operand flash path with a much
    # tighter tolerance (same kernel schedule, only MXU operand dtype
    # differs) — XLA-within-15% alone could hide a moderately wrong dS/dK
    # (round-2 advisor).
    monkeypatch.setattr(flash_mod, "_BF16_OPERANDS", False)
    monkeypatch.setenv("PBX_FLASH_BF16", "0")
    g_f32 = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    for name, a, b in zip("qkv", g_flash, g_f32):
        # atol 8e-2: a handful of elements (~5/131072) legitimately differ
        # by up to ~0.07 from bf16 quantization of the dS operands; a wrong
        # dS/dK formula moves thousands of elements, not five.
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=3e-2, atol=8e-2,
                                   err_msg=f"d{name}: bf16-operand vs "
                                           f"f32-operand flash")


def test_mixed_operand_switch(monkeypatch):
    """PBX_FLASH_MIXED (bf16 MXU operands ONLY for the QKT / dO.VT dots,
    whose operands are HBM-natural bf16): forward and gradients must be
    numerically equivalent to the committed f32-operand path — the bf16
    products are exact under f32 accumulation either way; the only
    daylight is f32 summation-order noise flipping the last bf16 output
    bit, so the tolerance is one-bf16-ULP scale, not an XLA-within-x%."""
    from pianobart_tpu.ops import flash as flash_mod
    q, k, v, mask = setup(seed=5)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss(q_, k_, v_, causal):
        o = flash_mod.flash_attention(q_, k_, v_, mask, causal, BLK, BLK)
        return (o.astype(jnp.float32) ** 2).sum()

    for causal in (False, True):
        monkeypatch.setattr(flash_mod, "_MIXED_OPERANDS", False)
        monkeypatch.setenv("PBX_FLASH_MIXED", "0")
        out_f32 = flash_mod.flash_attention(qb, kb, vb, mask, causal,
                                            BLK, BLK)
        g_f32 = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb, causal)

        monkeypatch.setattr(flash_mod, "_MIXED_OPERANDS", True)
        monkeypatch.setenv("PBX_FLASH_MIXED", "1")
        out_mix = flash_mod.flash_attention(qb, kb, vb, mask, causal,
                                            BLK, BLK)
        g_mix = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb, causal)

        np.testing.assert_allclose(np.asarray(out_mix, np.float32),
                                   np.asarray(out_f32, np.float32),
                                   rtol=1e-2, atol=2e-3,
                                   err_msg=f"mixed fwd (causal={causal})")
        for name, a, b in zip("qkv", g_mix, g_f32):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-2, atol=2e-2,
                err_msg=f"d{name}: mixed vs f32 (causal={causal})")


@pytest.mark.parametrize("mode", ["default", "all"])
def test_scoreprec_switch(monkeypatch, mode):
    """PBX_FLASH_SCOREPREC (precision=DEFAULT on the bf16-valued score
    dots; "all" extends it to the P/dS dots): the compile-pathology dodge
    for the MIXED variant.  On CPU (interpret mode) an f32 dot at DEFAULT
    precision is exact f32, so BOTH modes must be BITWISE identical to
    the committed path here — this pins the flag plumbing and the helper
    refactor.  On TPU, "default" truncates exactly-bf16-valued operands
    (lossless, the MIXED numerics) while "all" additionally truncates
    P/dS to bf16 in the MXU (the standard FlashAttention approximation,
    validated on-chip via step_lab loss traces before any adoption)."""
    from pianobart_tpu.ops import flash as flash_mod
    q, k, v, mask = setup(seed=6)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss(q_, k_, v_, causal):
        o = flash_mod.flash_attention(q_, k_, v_, mask, causal, BLK, BLK)
        return (o.astype(jnp.float32) ** 2).sum()

    def set_mode(m):
        monkeypatch.setattr(flash_mod, "_SCORE_PREC", m)
        monkeypatch.setattr(flash_mod, "_SCORE_PREC_DEFAULT",
                            m in ("default", "all"))
        monkeypatch.setattr(flash_mod, "_ALL_PREC_DEFAULT", m == "all")
        if m:
            monkeypatch.setenv("PBX_FLASH_SCOREPREC", m)
        else:
            monkeypatch.delenv("PBX_FLASH_SCOREPREC", raising=False)

    for causal in (False, True):
        set_mode("")
        out_f32 = flash_mod.flash_attention(qb, kb, vb, mask, causal,
                                            BLK, BLK)
        g_f32 = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb, causal)

        set_mode(mode)
        out_sp = flash_mod.flash_attention(qb, kb, vb, mask, causal,
                                           BLK, BLK)
        g_sp = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb, causal)

        np.testing.assert_array_equal(
            np.asarray(out_sp, np.float32), np.asarray(out_f32, np.float32),
            err_msg=f"scoreprec={mode} fwd (causal={causal})")
        for name, a, b in zip("qkv", g_sp, g_f32):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                err_msg=f"d{name}: scoreprec={mode} vs committed "
                        f"(causal={causal})")
