"""Decode experiment lab: batch-1 (and optional B=16) full-1024-step
KV-cached decode latency under the step-perf flags — currently just
PBX_FFN_2D, which (unlike PBX_QKV_FUSED) also applies to the decode
forward pass and is the suspect for a 0.40 -> 0.46 s drift seen in a
single-rep bench.py reading.

Same discipline as step_lab.py: the flags are frozen at import, so each
variant runs in its own subprocess; the parent interleaves variants over
two sweeps and reports per-variant medians of per-child medians.  One
process at a time — the TPU is single-tenant.

Usage:
    python scripts/decode_lab.py            # parent sweep
    python scripts/decode_lab.py --child    # child: measure current env
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = {
    "ffn2d": {"PBX_FFN_2D": "1"},   # shipping default
    "ffn3d": {"PBX_FFN_2D": "0"},
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
    from pianobart_tpu.decode import generate

    cfg = PianoBartConfig(dtype=jnp.bfloat16)
    model = PianoBartLM(cfg)
    S = cfg.max_len
    rng = jax.random.PRNGKey(0)
    ids0 = jnp.zeros((1, S, 8), jnp.int32)
    m0 = jnp.ones((1, S))
    variables = nn.meta.unbox(model.init(rng, ids0, ids0, m0, m0))
    params = {"params": variables["params"]}

    npr = np.random.default_rng(0)
    intro = np.zeros((1, S, 8), dtype=np.int32)
    for f in range(8):
        intro[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (1, S))
    intro = jnp.asarray(intro)

    out = generate(params, intro, cfg=cfg, max_steps=S, force_full=True)
    _ = np.asarray(out).sum()  # compile + sync
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        out = generate(params, intro, rng=jax.random.PRNGKey(i + 1),
                       cfg=cfg, max_steps=S, force_full=True)
        _ = np.asarray(out).sum()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(json.dumps({
        "decode_s": round(ts[len(ts) // 2], 3),
        "decode_s_all": [round(t, 3) for t in ts],
        "flags": {"PBX_FFN_2D": os.environ.get("PBX_FFN_2D", "1")},
    }))


def parent() -> None:
    from sweep_lib import print_medians, run_sweep
    results = run_sweep(
        __file__, VARIANTS,
        lambda sweep, name, out: (
            f"[{sweep}] {name:6s} {out['decode_s']:6.3f} s  "
            f"(all: {out['decode_s_all']})"))
    print_medians(results, "decode_s", "s")


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        parent()
