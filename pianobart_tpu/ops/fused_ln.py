"""Fused dropout + residual-add + LayerNorm (pallas, in-kernel PRNG).

Every transformer sublayer in the trunk ends with the same tail
(``models/bart.py``):

    x = LayerNorm(residual + dropout(h))

Unfused, XLA runs this as: a hardware-RNG mask pass that MATERIALIZES a
(B, S, D) uint8 mask in HBM (saved for the backward — 40 sites x 33.5 MB at
the flagship shape = 1.3 GB of residuals), a select+add loop fusion, and a
separate LN reduction fusion reading the sum back.  This kernel does the
whole tail in ONE pass per direction:

* forward: draw the mask bits with the per-core PRNG *inside* the kernel
  (``pltpu.prng_seed`` / ``prng_random_bits``), apply dropout, add the
  residual, LayerNorm-normalize — one read of (h, residual), one write of
  the output plus (N,) row statistics.  No mask ever touches HBM.
* backward: re-seed with the same (seed, block) pair, regenerate the
  identical bits, rebuild y = residual + dropout(h) from the saved inputs,
  and produce dh, dresidual and per-block partial (dgamma, dbeta) sums.

Keep-probability is quantized to 2^-32 (exact for any practical rate); the
1/(1-p) rescale uses the actual quantized rate, so activations stay
unbiased — same policy as ops/dropout.py at 2^-8.

Statistics use flax's fast-variance convention (E[y^2] - E[y]^2, f32) so the
deterministic fallback path (plain ``Dropout`` + ``nn.LayerNorm`` in
models/bart.py) and this kernel agree to float rounding.

The reference gets this tail from torch/HF eager kernels
(``transformers`` Bart, PianoBart.py:23); there is no reference counterpart
to cite beyond the layer structure (modeling_bart residual blocks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rows_per_block(n_rows: int) -> int:
    # 256-row cap: the bwd holds ~6 f32 (r, d) intermediates live; at r=512,
    # d=1024 that overflows the 16 MB scoped-vmem stack (measured on v5e).
    # fwd and bwd MUST block identically — the bwd regenerates the dropout
    # mask by re-seeding the in-kernel PRNG with (seed, program_id), so the
    # (block index -> rows) mapping is part of the mask's definition.
    r = min(256, n_rows)
    while n_rows % r:
        r -= 128
    return r


def fused_eligible(shape) -> bool:
    """(..., D) with 128-aligned D and 128-divisible row count."""
    n = 1
    for s in shape[:-1]:
        n *= s
    d = shape[-1]
    if d % 128 or n % 128:
        return False
    return _rows_per_block(n) >= 128


def _threshold(rate: float) -> int:
    return int(round(rate * 2.0 ** 32))


def _keep_scale(rate: float) -> float:
    t = _threshold(rate)
    return 2.0 ** 32 / (2.0 ** 32 - t)


def _keep_mask(seed_ref, bits_ref, shape, rate: float):
    """Dropout keep-mask: in-kernel PRNG on TPU; precomputed bits in
    interpret mode (CPU tests — `prng_seed` has no CPU lowering)."""
    if bits_ref is None:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    else:
        bits = bits_ref[...]
    return bits >= jnp.uint32(_threshold(rate))


def _fwd_kernel(seed_ref, h_ref, res_ref, gamma_ref, beta_ref,
                out_ref, mean_ref, rstd_ref, *, rate: float, eps: float,
                bits_ref=None):
    keep = _keep_mask(seed_ref, bits_ref, h_ref.shape, rate)
    h = h_ref[...].astype(jnp.float32) * jnp.float32(_keep_scale(rate))
    y = res_ref[...].astype(jnp.float32) + jnp.where(keep, h, 0.0)
    mean = y.mean(axis=1, keepdims=True)
    # clamp like flax _compute_stats / the unfused fallback (bart.py): f32
    # cancellation can push E[y^2]-mean^2 below -eps for large near-constant
    # rows, and rsqrt(negative) would poison the step with NaN
    var = jnp.maximum(
        0.0, (y * y).mean(axis=1, keepdims=True) - mean * mean)
    rstd = jax.lax.rsqrt(var + jnp.float32(eps))
    xhat = (y - mean) * rstd
    g = gamma_ref[...].astype(jnp.float32)          # (1, D)
    b = beta_ref[...].astype(jnp.float32)
    out_ref[...] = (xhat * g + b).astype(out_ref.dtype)
    mean_ref[0, 0, :] = mean[:, 0]
    rstd_ref[0, 0, :] = rstd[:, 0]


def _bwd_kernel(seed_ref, h_ref, res_ref, gamma_ref, mean_ref, rstd_ref,
                dout_ref, dh_ref, dres_ref, dgamma_ref, dbeta_ref,
                *, rate: float, eps: float, bits_ref=None):
    keep = _keep_mask(seed_ref, bits_ref, h_ref.shape, rate)  # == forward's
    ks = jnp.float32(_keep_scale(rate))
    h = h_ref[...].astype(jnp.float32) * ks
    y = res_ref[...].astype(jnp.float32) + jnp.where(keep, h, 0.0)
    mean = mean_ref[0, 0, :][:, None]               # (R, 1)
    rstd = rstd_ref[0, 0, :][:, None]
    xhat = (y - mean) * rstd
    dout = dout_ref[...].astype(jnp.float32)
    g = dout * gamma_ref[...].astype(jnp.float32)   # dL/dxhat
    m1 = g.mean(axis=1, keepdims=True)
    m2 = (g * xhat).mean(axis=1, keepdims=True)
    dy = rstd * (g - m1 - xhat * m2)
    dres_ref[...] = dy.astype(dres_ref.dtype)
    dh_ref[...] = jnp.where(keep, dy * ks, 0.0).astype(dh_ref.dtype)
    dgamma_ref[0, 0, :] = (dout * xhat).sum(axis=0)
    dbeta_ref[0, 0, :] = dout.sum(axis=0)


def _host_bits(seed, n, d):
    """Interpret-mode substitute for the in-kernel PRNG (CPU tests)."""
    key = jax.random.key(jnp.asarray(seed, jnp.uint32))
    return jax.random.bits(key, (n, d), dtype=jnp.uint32)


def _fwd_call(h2, res2, gamma, beta, seed, rate, eps):
    n, d = h2.shape
    r = _rows_per_block(n)
    nb = n // r
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape(1)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((r, d), lambda i: (i, 0)),
        pl.BlockSpec((r, d), lambda i: (i, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
    ]
    args = [seed_arr, h2, res2, gamma.reshape(1, d), beta.reshape(1, d)]
    if _interpret():
        kernel = lambda s, bits, h, res, g, b, o, mn, rs: _fwd_kernel(
            s, h, res, g, b, o, mn, rs, rate=rate, eps=eps, bits_ref=bits)
        in_specs.insert(1, pl.BlockSpec((r, d), lambda i: (i, 0)))
        args.insert(1, _host_bits(seed, n, d))
    else:
        kernel = functools.partial(_fwd_kernel, rate=rate, eps=eps)
    out, mean, rstd = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r, d), lambda i: (i, 0)),
            # unit middle dim: trailing block dims == array dims -> legal
            pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), h2.dtype),
            jax.ShapeDtypeStruct((nb, 1, r), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, r), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return out, mean, rstd


def _bwd_call(h2, res2, gamma, mean, rstd, dout2, seed, rate, eps):
    n, d = h2.shape
    r = _rows_per_block(n)
    nb = n // r
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape(1)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((r, d), lambda i: (i, 0)),
        pl.BlockSpec((r, d), lambda i: (i, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
        pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0)),
        pl.BlockSpec((r, d), lambda i: (i, 0)),
    ]
    args = [seed_arr, h2, res2, gamma.reshape(1, d), mean, rstd, dout2]
    if _interpret():
        kernel = lambda s, bits, h, res, g, mn, rs, do, dh, dr, dg, db: \
            _bwd_kernel(s, h, res, g, mn, rs, do, dh, dr, dg, db,
                        rate=rate, eps=eps, bits_ref=bits)
        in_specs.insert(1, pl.BlockSpec((r, d), lambda i: (i, 0)))
        args.insert(1, _host_bits(seed, n, d))
    else:
        kernel = functools.partial(_bwd_kernel, rate=rate, eps=eps)
    dh, dres, dgamma_p, dbeta_p = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r, d), lambda i: (i, 0)),
            pl.BlockSpec((r, d), lambda i: (i, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), h2.dtype),
            jax.ShapeDtypeStruct((n, d), res2.dtype),
            jax.ShapeDtypeStruct((nb, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return dh, dres, dgamma_p.sum((0, 1)), dbeta_p.sum((0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dropout_add_ln(h, residual, gamma, beta, seed,
                   rate: float, eps: float = 1e-5):
    """LayerNorm(residual + dropout(h)) in one fused pass.

    ``h``/``residual``: (..., D); ``gamma``/``beta``: (D,); ``seed``: uint32
    scalar (fold the rng yourself per call site); ``rate`` static.
    """
    return _vjp_fwd(h, residual, gamma, beta, seed, rate, eps)[0]


def _vjp_fwd(h, residual, gamma, beta, seed, rate, eps):
    shape = h.shape
    d = shape[-1]
    h2 = h.reshape(-1, d)
    res2 = residual.reshape(-1, d)
    out, mean, rstd = _fwd_call(h2, res2, gamma, beta, seed, rate, eps)
    return out.reshape(shape), (h2, res2, gamma, mean, rstd, seed, shape)


def _vjp_bwd(rate, eps, res, g):
    h2, res2, gamma, mean, rstd, seed, shape = res
    d = shape[-1]
    dout2 = g.reshape(-1, d)
    dh, dres, dgamma, dbeta = _bwd_call(h2, res2, gamma, mean, rstd, dout2,
                                        seed, rate, eps)
    return (dh.reshape(shape), dres.reshape(shape),
            dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype),
            jnp.zeros((), dtype=jax.dtypes.float0))


dropout_add_ln.defvjp(_vjp_fwd, _vjp_bwd)
