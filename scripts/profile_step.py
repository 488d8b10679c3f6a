"""Capture a device trace of the pretrain step and print the op breakdown.

Uses jax.profiler + the installed xprof/tensorboard-plugin-profile converter
to print where the step time actually goes (op_profile by category).
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

TRACE_DIR = "/tmp/pbx_trace"


def capture():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from flax import linen as nn
    from pianobart_tpu import vocab as V
    from pianobart_tpu.models import PianoBartConfig, PianoBartLM
    from pianobart_tpu.train.pretrain import pretrain_multi_step
    from pianobart_tpu.train.state import TrainState, make_optimizer

    B = 32
    cfg = PianoBartConfig(dtype=jnp.bfloat16)
    model = PianoBartLM(cfg)
    S = cfg.max_len
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

    # warm / compile outside the trace
    state, (losses, _) = pretrain_multi_step(state, batch, rng, cfg, 0.15, 10)
    _ = float(losses[-1])

    jax.profiler.start_trace(TRACE_DIR)
    state, (losses, _) = pretrain_multi_step(state, batch, rng, cfg, 0.15, 10)
    _ = float(losses[-1])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)


def report():
    xplanes = glob.glob(os.path.join(
        TRACE_DIR, "plugins/profile/*/*.xplane.pb"))
    if not xplanes:
        print("NO xplane captured — device tracing unsupported through the "
              "tunnel?", flush=True)
        return
    xp = max(xplanes, key=os.path.getmtime)
    print("xplane:", xp, f"({os.path.getsize(xp)} bytes)", flush=True)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for tool in ("op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([xp], tool, {})
        except Exception as exc:
            print(f"{tool} failed: {type(exc).__name__}: {exc}", flush=True)
            continue
        out = f"/tmp/pbx_{tool}.json"
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except Exception:
                pass
            data = data.decode("utf-8", errors="replace")
        with open(out, "w") as f:
            f.write(data)
        print(f"wrote {out} ({len(data)} chars)", flush=True)
        if tool == "op_profile":
            try:
                j = json.loads(data)
                cats = j.get("byCategory", {}).get("children", [])
                total = j.get("byCategory", {}).get("metrics", {})
                print("total:", total, flush=True)
                for c in cats[:15]:
                    m = c.get("metrics", {})
                    print(f"  {c.get('name', '?'):40s} "
                          f"time={m.get('time', 0):.4f} "
                          f"flops={m.get('flops', 0):.4f}", flush=True)
            except Exception as exc:
                print("summary parse failed:", exc, flush=True)


if __name__ == "__main__":
    if "--report-only" not in sys.argv:
        capture()
    report()
