"""Benchmark harness.

Measures the headline metric from BASELINE.md on the attached TPU chip:
pretraining throughput in octuple tokens/sec/chip for the full PianoBART
workload (d_model 1024, 8+8 layers, seq 1024, fused 1280-way vocab,
on-device corruption inside the step — i.e. the COMPLETE step the reference
runs, not just the forward).

Also measures batch-1 KV-cached continuation decode latency for a
1024-token intro (secondary target: < 2 s).

Baseline note: the reference publishes no numbers (SURVEY §6).
``A100_BASELINE_TOKS`` is DERIVED in scripts/baseline_estimate.py (full
write-up in BASELINE.md): the shipped trainer is FP32 (no amp anywhere;
torch 2.0.1 defaults matmul TF32 OFF), so one A100 sustains ~21.6 TFLOP of
step compute at ~16.6 TF/s FP32 -> 1.31 s, strictly serialized with
109 ms/batch of host-Python corruption (measured by executing the
unmodified ``Pretrainer.gen_mask``/shift loop, pretrain.py:131-144), a
20 ms host argmax and an 84 MB logits D2H copy (pretrain.py:164-168)
-> 1.48 s/step = 11,090 tok/s/chip.  Round 1's hand-waved 18k estimate
was ~60% generous to the reference; both appear in BASELINE.md.

Prints the primary JSON metric line {"metric", "value", "unit",
"vs_baseline"} right after the train timing loop (so a kill during the
decode phases can never erase it — BENCH_r03 postmortem), then re-prints
the SAME metric enriched with the decode extras and ``"final": true``
once the decode benches finish.  Parse the LAST line for the full
picture, the FIRST for the train number alone; both carry the same
"metric"/"value".  ``PBX_BENCH_SKIP_DECODE=1`` stops after the primary
line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

A100_BASELINE_TOKS = 11_090.0     # derived: BASELINE.md (FP32 + host loop)
A100_BASELINE_TOKS_R1 = 18_000.0  # round-1 hand-estimate (generous to us)

def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat bench/driver runs skip the
    multi-minute remote compiles."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

import os

BATCH = int(os.environ.get("PBX_BENCH_BATCH", "32"))


def _note(msg: str) -> None:
    """Per-phase progress on stderr so a killed run leaves a trail."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from pianobart_tpu import vocab as V
    from pianobart_tpu.models import PianoBartConfig, PianoBartLM
    from pianobart_tpu.train.pretrain import pretrain_multi_step
    from pianobart_tpu.train.state import TrainState, make_optimizer

    dev = jax.devices()[0]
    platform = dev.platform
    cfg = PianoBartConfig(
        dtype=jnp.bfloat16,
        remat_ffn=os.environ.get("PBX_BENCH_REMAT_FFN", "0") == "1")
    model = PianoBartLM(cfg)

    B, S = BATCH, cfg.max_len
    K = 10  # steps per device dispatch (amortizes tunnel round trips)
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

    # Warmup / compile (one multi-step dispatch).
    _note(f"warmup dispatch (B={B}, K={K}) on {dev.device_kind} ...")
    t_warm = time.perf_counter()
    state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg, 0.15, K)
    _ = float(losses[-1])
    t_warm = time.perf_counter() - t_warm
    _note(f"warmup done in {t_warm:.1f} s "
          f"({'cached executable' if t_warm < 120 else 'fresh compile'})")

    # Analytic-FLOP MFU (model + hardware conventions): see
    # pianobart_tpu/utils/flops.py — shared with scripts/longctx_tpu_check.py.
    from pianobart_tpu.utils.flops import device_peak_flops, pretrain_step_flops
    model_flops_per_step, hw_flops_per_step = pretrain_step_flops(
        state.params, cfg, B, S)

    # Diagnostic pass: median of `reps` individually-synced K-step
    # dispatches (same methodology as scripts/step_lab.py — through the
    # remote-TPU tunnel individual round trips occasionally straggle by
    # 1-2%, so median, not mean).  This pays the tunnel RTT every K steps;
    # the PRIMARY pipelined measurement follows below.
    reps = int(os.environ.get("PBX_BENCH_REPS", "5"))
    _note(f"timing train loop ({reps} dispatches x {K} steps) ...")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg,
                                                 0.15, K)
        _ = float(losses[-1])  # host sync each dispatch
        times.append(time.perf_counter() - t0)
    dt_disp = sorted(times)[len(times) // 2]  # per-dispatch median
    _note("dispatch ms/step: "
          + ", ".join(f"{t / K * 1e3:.1f}" for t in times))

    # Primary metric: PIPELINED steady state — reps back-to-back dispatches,
    # ONE end sync.  This is how PretrainRunner actually trains (async
    # dispatch hides input transfers and the tunnel RTT; measured
    # 0.55 ms/step overlap cost, ROADMAP.md), whereas the per-dispatch
    # median above pays the ~25 ms host round trip every K steps.  Both
    # are printed; the pipelined number is the training throughput.
    t0 = time.perf_counter()
    for _ in range(reps):
        state, (losses, *_) = pretrain_multi_step(state, batch, rng, cfg,
                                                  0.15, K)
    _ = float(losses[-1])  # single end-of-run sync
    dt_pipe = time.perf_counter() - t0
    steps = reps * K
    toks_per_sec = steps * B * S / dt_pipe
    step_ms = dt_pipe / steps * 1e3
    disp_ms = dt_disp / K * 1e3
    _note(f"pipelined {step_ms:.1f} ms/step over {steps} steps "
          f"(per-dispatch median {disp_ms:.1f})")

    mfu_model = mfu_hw = None
    peak = device_peak_flops(dev)
    if peak:
        mfu_model = model_flops_per_step / (dt_pipe / steps) / peak
        mfu_hw = hw_flops_per_step / (dt_pipe / steps) / peak

    def emit(decode_s=None, decode_cps=None, final=False):
        """One JSON result line.  Called right after the train timing loop —
        BEFORE any decode compile — so a timeout during the decode phases can
        never erase the finished primary measurement (round-3 postmortem:
        BENCH_r03 was rc=124/parsed=null because the single print at the end
        died with the process).  The enriched re-print carries
        ``"final": true`` so consumers can tell the two apart."""
        print(json.dumps({
            "metric": "pretrain_octuple_tokens_per_sec_per_chip",
            "value": round(toks_per_sec, 1),
            "unit": f"tok/s ({platform}, bf16, batch {B}, "
                    f"step {step_ms:.1f} ms pipelined over {reps}x{K} steps "
                    f"(per-dispatch median {disp_ms:.1f} ms)"
                    + (f", model MFU {mfu_model * 100:.1f}%"
                       f" (hw {mfu_hw * 100:.1f}%)" if mfu_model else "")
                    + (f", decode1024 {decode_s:.2f} s" if decode_s else "")
                    + (f", decode_b16 {decode_cps:.1f} cont/s" if decode_cps
                       else "")
                    + ")",
            # primary ratio: derived A100 baseline (BASELINE.md); the round-1
            # hand-estimate ratio is printed alongside so the headline does
            # not depend on which denominator one believes.
            "vs_baseline": round(toks_per_sec / A100_BASELINE_TOKS, 2),
            "baseline_toks_derived": A100_BASELINE_TOKS,
            "vs_baseline_round1_estimate":
                round(toks_per_sec / A100_BASELINE_TOKS_R1, 2),
            **({"final": True} if final else {}),
        }), flush=True)

    emit()  # primary metric is now safe on stdout
    _note(f"train: {toks_per_sec:.1f} tok/s, {step_ms:.1f} ms/step")
    if os.environ.get("PBX_BENCH_SKIP_DECODE", "0") == "1":
        _note("PBX_BENCH_SKIP_DECODE=1: done")
        return

    # Secondary: batch-1 decode latency for a full 1024-token intro.
    decode_s = None
    try:
        from pianobart_tpu.decode import generate
        _note("decode bench (B=1) ...")
        intro = jnp.asarray(batch[:1])
        params = {"params": state.params}
        # force_full: all 1024 decode steps run (random weights would
        # early-stop immediately and flatter the number)
        out = generate(params, intro, cfg=cfg, max_steps=S, force_full=True)
        _ = np.asarray(out).sum()  # compile + sync
        t0 = time.perf_counter()
        out = generate(params, intro, rng=jax.random.PRNGKey(1), cfg=cfg,
                       max_steps=S, force_full=True)
        _ = np.asarray(out).sum()
        decode_s = time.perf_counter() - t0
    except Exception as exc:  # keep the primary metric robust
        print(f"decode bench failed: {exc}", file=sys.stderr)

    # Batched generation throughput (the reference is hard-limited to
    # batch-1 decoding, model.py:29-31): full-length continuations/sec at
    # B=16 through the same KV-cached loop.
    decode_cps = None
    try:
        from pianobart_tpu.decode import generate
        _note("decode bench (B=16) ...")
        introB = jnp.asarray(batch[:16])
        params = {"params": state.params}
        out = generate(params, introB, cfg=cfg, max_steps=S, force_full=True)
        _ = np.asarray(out).sum()
        t0 = time.perf_counter()
        out = generate(params, introB, rng=jax.random.PRNGKey(2), cfg=cfg,
                       max_steps=S, force_full=True)
        _ = np.asarray(out).sum()
        # introB is batch[:16] == min(PBX_BENCH_BATCH, 16) rows — divide by
        # the REAL row count, not a hardcoded 16 (round-3 review)
        decode_cps = introB.shape[0] / (time.perf_counter() - t0)
    except Exception as exc:
        print(f"batched decode bench failed: {exc}", file=sys.stderr)

    # Re-emit the same primary metric enriched with the decode extras: a
    # driver that parses the LAST JSON line gets the full picture, one that
    # parses the FIRST (or killed us mid-decode) still has the train number.
    emit(decode_s=decode_s, decode_cps=decode_cps, final=True)


if __name__ == "__main__":
    main()
