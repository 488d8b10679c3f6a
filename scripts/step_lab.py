"""Full-train-step experiment lab: measures pretrain_multi_step under the
step-perf experiment flags (PBX_EMB_ONEHOT_BWD / PBX_QKV_FUSED / PBX_FFN_2D
and combinations).

The flags are frozen at import (env is not a jit cache key), so each variant
runs in its OWN subprocess; the parent sweeps all variants twice in
interleaved order (compile caches make the second sweep cheap) and reports
per-variant medians.  One process at a time — the TPU is single-tenant.

Usage:
    python scripts/step_lab.py            # parent: sweep all variants
    python scripts/step_lab.py --child    # child: measure current env
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Settled (interleaved medians, v5e, B=32, 2026-08-17): ffn2d 414.6 ms vs
# 438.0 base (+5.6%), emb 433.0 (+1.2%), ffn2d+emb 409.4/408.7 (80.0k
# tok/s) — BOTH NOW DEFAULTS.  qkv 462.0 (-5%), fused dropln 447.2 (-2%,
# XLA's own dropout+add+LN loop fusions win), dropln+defaults 421.3 —
# keep off.  Variant names reflect the new defaults: "base" is the
# shipping config; the others toggle one lever each.
VARIANTS = {
    "base":      {},
    "ffn3d":     {"PBX_FFN_2D": "0"},
    "scat_emb":  {"PBX_EMB_ONEHOT_BWD": "0"},
    "legacy":    {"PBX_FFN_2D": "0", "PBX_EMB_ONEHOT_BWD": "0"},
    "dropln":    {"PBX_FUSED_DROPLN": "1"},
    "qkv":       {"PBX_QKV_FUSED": "1"},
    # TOMBSTONE: the "mixed" / "scoreprec" / "scoreprec_all" flash
    # operand-dtype variants were removed in round 4.  MIXED was
    # compile-pathological on the shared serial remote helper (>55 min,
    # wedging every later compile); SCOREPREC was proven a bitwise no-op
    # on chip (scripts/scoreprec_tpu_check.py).  ops/flash.py no longer
    # reads the PBX_FLASH_* env flags — see its tombstone + ROADMAP.md §3.
}


def _effective_flags() -> dict:
    from pianobart_tpu.models import bart as bart_mod
    from pianobart_tpu.models import embedding as emb_mod
    from pianobart_tpu.ops import flash as flash_mod
    return {
        "ffn_2d": bart_mod._FFN_2D,
        "emb_onehot_bwd": emb_mod._ONEHOT_BWD,
        "qkv_fused": bart_mod._QKV_FUSED,
        "fused_dropln": bart_mod._FUSED_DROPLN,
        "flash_mixed": flash_mod._MIXED_OPERANDS,
        "flash_bf16": flash_mod._BF16_OPERANDS,
        "flash_scoreprec": flash_mod._SCORE_PREC,
    }


def child() -> None:
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", f"{REPO}/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from flax import linen as nn

    from pianobart_tpu import vocab as V
    from pianobart_tpu.models import PianoBartConfig, PianoBartLM
    from pianobart_tpu.train.pretrain import pretrain_multi_step
    from pianobart_tpu.train.state import TrainState, make_optimizer

    B = int(os.environ.get("PBX_LAB_BATCH", "32"))
    cfg = PianoBartConfig(dtype=jnp.bfloat16)
    model = PianoBartLM(cfg)
    S = cfg.max_len
    K = 10
    rng = jax.random.PRNGKey(0)
    ids0 = jnp.zeros((B, S, 8), jnp.int32)
    m0 = jnp.ones((B, S))
    variables = nn.meta.unbox(model.init(rng, ids0, ids0, m0, m0))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_optimizer())
    npr = np.random.default_rng(0)
    batch = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        batch[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    batch = jnp.asarray(batch)

    state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg, 0.15, K)
    loss0 = float(losses[-1])   # warm + correctness probe

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg,
                                                 0.15, K)
        _ = float(losses[-1])
        ts.append((time.perf_counter() - t0) / K)
    ts.sort()
    med = ts[len(ts) // 2]
    print(json.dumps({
        "step_ms": round(med * 1e3, 1),
        "toks_per_sec": round(B * S / med, 1),
        "loss0": round(loss0, 4),
        # effective module values, not raw env: FFN_2D / ONEHOT_BWD
        # default ON when the env var is unset
        "flags": _effective_flags(),
    }))


def parent() -> None:
    # Sweep discipline + wedged-compile policy live in sweep_lib.run_sweep.
    # --variants a,b,c restricts the sweep (e.g. "base,mixed").
    from sweep_lib import print_medians, run_sweep
    chosen = dict(VARIANTS)
    if "--variants" in sys.argv:
        names = sys.argv[sys.argv.index("--variants") + 1].split(",")
        chosen = {n: VARIANTS[n] for n in names}
    results = run_sweep(
        __file__, chosen,
        lambda sweep, name, out: (
            f"[{sweep}] {name:7s} {out['step_ms']:7.1f} ms "
            f"{out['toks_per_sec']:9.0f} tok/s  loss0={out['loss0']}"))
    print_medians(results, "step_ms", "ms",
                  extra=lambda outs: f"loss0={outs[-1]['loss0']}")


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        parent()
