"""On-chip long-context envelope: flagship pretrain step at S=2048 on ONE
v5e chip (round-3 verdict item 8).

The sp ring path is proven correct at S=2048 x sp2 (and S=4096 x sp4) on
the virtual CPU mesh; this measures what the single real chip CAN measure —
the dense flash-kernel step at double sequence length — so the framework's
long-context claim carries a hardware number: step time, tok/s, and MFU at
S=2048 vs the S=1024 headline (bench.py).

Tries B from PBX_LONGCTX_BATCH (default 16 = same 32k tokens/step as the
headline B=32 x S=1024) and halves on OOM, then retries the smallest batch
with remat_ffn.  Results go to stdout (one JSON line, bench.py format) and
a ROADMAP-ready summary on stderr.

Usage: python scripts/longctx_tpu_check.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

S = int(os.environ.get("PBX_LONGCTX_SEQ", "2048"))
K = 10    # steps per dispatch (amortizes the ~25 ms tunnel RTT)
REPS = int(os.environ.get("PBX_LONGCTX_REPS", "3"))


def _note(msg):
    print(f"[longctx {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _measure(B, remat_ffn):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from pianobart_tpu import vocab as V
    from pianobart_tpu.models import PianoBartConfig, PianoBartLM
    from pianobart_tpu.train.pretrain import pretrain_multi_step
    from pianobart_tpu.train.state import TrainState, make_optimizer

    cfg = PianoBartConfig(dtype=jnp.bfloat16, max_len=S, remat_ffn=remat_ffn)
    model = PianoBartLM(cfg)
    rng = jax.random.PRNGKey(0)
    ids0 = jnp.zeros((B, S, 8), jnp.int32)
    m0 = jnp.ones((B, S))
    variables = nn.meta.unbox(model.init(rng, ids0, ids0, m0, m0))
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=make_optimizer())
    npr = np.random.default_rng(0)
    batch = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        batch[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    batch = jnp.asarray(batch)

    _note(f"warmup dispatch B={B} S={S} remat_ffn={remat_ffn} ...")
    t0 = time.perf_counter()
    state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg, 0.15, K)
    _ = float(losses[-1])
    _note(f"warmup done in {time.perf_counter() - t0:.1f} s")

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg,
                                                 0.15, K)
        _ = float(losses[-1])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    _note("dispatch ms/step: " + ", ".join(f"{t / K * 1e3:.1f}"
                                           for t in times))

    # analytic MFU: the exact helper bench.py uses (one shared convention)
    from pianobart_tpu.utils.flops import (device_peak_flops,
                                           pretrain_step_flops)
    model_flops, hw_flops = pretrain_step_flops(state.params, cfg, B, S)
    peak = device_peak_flops(jax.devices()[0])
    mfu_m = model_flops / (dt / K) / peak if peak else None
    mfu_h = hw_flops / (dt / K) / peak if peak else None
    return {
        "B": B, "S": S, "remat_ffn": remat_ffn,
        "step_ms": dt / K * 1e3,
        "toks_per_sec": K * B * S / dt,
        "mfu_model": mfu_m, "mfu_hw": mfu_h,
    }


def main():
    sys.path.insert(0, REPO)
    import __graft_entry__ as g
    g._enable_compile_cache()

    B = int(os.environ.get("PBX_LONGCTX_BATCH", "16"))
    attempts = []
    while B >= 2:
        attempts.append((B, False))
        B //= 2
    # last resort: the smallest batch again, with FFN rematerialisation
    attempts.append((attempts[-1][0], True))
    result = None
    for B, remat in attempts:
        try:
            result = _measure(B, remat)
            break
        except Exception as exc:
            msg = str(exc)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg \
                    or "OOM" in msg:
                _note(f"B={B} remat_ffn={remat} OOM; retrying smaller")
                continue
            raise
    if result is None:
        raise SystemExit("all batch sizes OOM'd")
    print(json.dumps({
        "metric": f"pretrain_s{result['S']}_tokens_per_sec_per_chip",
        "value": round(result["toks_per_sec"], 1),
        "unit": (f"tok/s (tpu, bf16, batch {result['B']}, seq {result['S']}, "
                 f"step {result['step_ms']:.1f} ms"
                 + (f", model MFU {result['mfu_model'] * 100:.1f}%"
                    f" (hw {result['mfu_hw'] * 100:.1f}%)"
                    if result["mfu_model"] else "")
                 + (", remat_ffn" if result["remat_ffn"] else "") + ")"),
    }), flush=True)


if __name__ == "__main__":
    main()
