"""Capture a device trace of the pretrain step and print the op breakdown.

Uses jax.profiler + the installed xprof/tensorboard-plugin-profile converter
to print where the step time actually goes (op_profile by category).
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
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

    # honor the bench knob so a profile explains the bench run it's
    # taken for (round-3 review: hardcoded B silently profiled a
    # different config)
    B = int(os.environ.get("PBX_BENCH_BATCH", "32"))
    # PBX_PROFILE_SEQ profiles the long-context shapes measured by
    # scripts/longctx_tpu_check.py (e.g. SEQ=2048 BATCH=16)
    seq = os.environ.get("PBX_PROFILE_SEQ")
    cfg = (PianoBartConfig(dtype=jnp.bfloat16, max_len=int(seq)) if seq
           else PianoBartConfig(dtype=jnp.bfloat16))
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
    state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg, 0.15, 10)
    _ = float(losses[-1])

    # clear stale traces: report() globs the newest xplane, and a capture
    # that produced none would silently report yesterday's profile
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg, 0.15, 10)
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
    # the standalone `xprof` package ships a converter that works with the
    # installed protobuf; tensorboard_plugin_profile 2.13's does not.
    from xprof.convert import raw_to_tool_data as rtd
    try:
        data, _ = rtd.xspace_to_tool_data([xp], "op_profile", {})
    except Exception as exc:
        # the capture is the expensive part; never discard it over a
        # converter hiccup — the xplane stays on disk for --report-only
        print(f"op_profile conversion failed: {type(exc).__name__}: {exc}",
              flush=True)
        return
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except Exception:
            pass
        data = data.decode("utf-8", errors="replace")
    out = "/tmp/pbx_op_profile.json"
    with open(out, "w") as f:
        f.write(data)
    print(f"wrote {out} ({len(data)} chars)", flush=True)
    j = json.loads(data)
    root = j.get("byProgramExcludeIdle") or j.get("byProgram") or {}

    def rt(n):
        return n.get("metrics", {}).get("rawTime", 0)

    progs = root.get("children", [])
    if not progs:
        print("no programs in op_profile", flush=True)
        return
    main_prog = max(progs, key=rt)
    cats = main_prog.get("children", [])
    total = sum(rt(c) for c in cats) or 1
    print(f"program {main_prog.get('name')}: "
          f"{total / 1e12:.3f} s of category time", flush=True)
    for c in sorted(cats, key=rt, reverse=True)[:12]:
        m = c.get("metrics", {})
        bw = (m.get("bandwidthUtils") or [0])[0]
        print(f"  {rt(c) / total * 100:6.2f}%  {rt(c) / 1e12:7.3f}s  "
              f"bw={bw:.2f}  {c.get('name', '?')}", flush=True)
        for cc in sorted(c.get("children", []), key=rt, reverse=True)[:3]:
            print(f"        {rt(cc) / total * 100:5.2f}%  "
                  f"{cc.get('name', '?')[:60]}", flush=True)


if __name__ == "__main__":
    if "--report-only" not in sys.argv:
        capture()
    report()
