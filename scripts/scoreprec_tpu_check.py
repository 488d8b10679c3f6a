"""TPU numerics check for the (retired) SCOREPREC flash-kernel variants.

HISTORICAL (round 3→4): this measurement SETTLED the lever — both modes
are bitwise no-ops on chip — and the PBX_FLASH_SCOREPREC env flag was
subsequently removed from ops/flash.py.  The script now flips the module
constants directly in each child so the measurement stays reproducible.


CPU tests (tests/test_flash.py::test_scoreprec_switch) pin both modes
bitwise to the committed path — but only because CPU executes f32 dots
exactly regardless of ``precision``.  The real effect exists only on the
chip, where precision=DEFAULT lowers an f32 dot as one bf16 MXU pass:

* ``default`` truncates the Q·Kᵀ / dO·Vᵀ operands — exactly-bf16-valued
  on the training path, so outputs should match the committed path to
  f32 summation-order noise (tight tolerance);
* ``all`` additionally truncates the f32 (S, S) P/dS intermediates to
  bf16 — the standard FlashAttention approximation; expected error is
  bf16-epsilon scale (~1e-2 relative), NOT tight.

The flag is frozen at ``pianobart_tpu.ops.flash`` import, so each mode
runs in its own subprocess; the parent compares fwd outputs and dq/dk/dv
against the committed path and prints max abs/rel errors.  Run AFTER any
queued TPU work (each child compiles 2 small kernel programs through the
serial remote helper).

Usage: python scripts/scoreprec_tpu_check.py            # parent
       python scripts/scoreprec_tpu_check.py --child X  # internal
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

OUT = "/tmp/scoreprec_check"
# Flagship head geometry, small batch: compile stays cheap, MXU shapes real.
B, S, H, D = 4, 1024, 8, 128


def child(mode: str) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", f"{REPO}/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from pianobart_tpu.ops import flash as flash_mod

    if os.environ.get("PBX_CHECK_ALLOW_CPU", "0") != "1":
        assert jax.default_backend() == "tpu", jax.default_backend()
    # Round 4: the PBX_FLASH_SCOREPREC env flag was removed from
    # ops/flash.py (lever settled as a bitwise no-op on chip); to re-run
    # this historical measurement, flip the module constants directly.
    flash_mod._SCORE_PREC = mode
    flash_mod._SCORE_PREC_DEFAULT = mode in ("default", "all")
    flash_mod._ALL_PREC_DEFAULT = mode == "all"

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    q = (jax.random.normal(k1, (B, S, H, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    k = (jax.random.normal(k2, (B, S, H, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    v = jax.random.normal(k3, (B, S, H, D), jnp.float32).astype(jnp.bfloat16)
    mask = jnp.ones((B, S)).at[1, S - 40:].set(0.0)
    do = jax.random.normal(k4, (B, S, H, D), jnp.float32).astype(jnp.bfloat16)

    def f(q_, k_, v_):
        o = flash_mod.flash_attention(q_, k_, v_, mask, True, None, None)
        return (o.astype(jnp.float32) * do.astype(jnp.float32)).sum()

    out = jax.jit(lambda a, b, c: flash_mod.flash_attention(
        a, b, c, mask, True, None, None))(q, k, v)
    dq, dk, dv = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
    tag = mode or "base"
    np.savez(f"{OUT}_{tag}.npz",
             out=np.asarray(out, np.float32), dq=np.asarray(dq, np.float32),
             dk=np.asarray(dk, np.float32), dv=np.asarray(dv, np.float32))
    print(f"child {tag}: saved", flush=True)


def _cmp(name, a, b, atol, rtol):
    err = np.abs(a - b)
    scale = np.maximum(np.abs(b), 1e-3)
    rel = (err / scale).max()
    ok = np.allclose(a, b, atol=atol, rtol=rtol)
    print(f"  {name}: max_abs={err.max():.3e} max_rel={rel:.3e} "
          f"{'OK' if ok else 'FAIL'} (atol={atol}, rtol={rtol})")
    return ok


def main() -> None:
    os.makedirs(os.path.dirname(OUT) or "/tmp", exist_ok=True)
    for mode in ("", "default", "all"):
        env = dict(os.environ)
        env.pop("PBX_FLASH_SCOREPREC", None)
        if mode:
            env["PBX_FLASH_SCOREPREC"] = mode
        env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            env=env, timeout=3600)
        if r.returncode != 0:
            raise SystemExit(f"child {mode or 'base'} failed")

    base = np.load(f"{OUT}_base.npz")
    ok = True
    for mode, atol, rtol in (("default", 2e-2, 1e-2), ("all", 2e-1, 5e-2)):
        got = np.load(f"{OUT}_{mode}.npz")
        print(f"mode={mode} vs committed path:")
        for name in ("out", "dq", "dk", "dv"):
            ok &= _cmp(name, got[name], base[name], atol, rtol)
    print("SCOREPREC TPU CHECK:", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
