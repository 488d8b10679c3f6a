"""Serving benchmark: concurrent HTTP clients against the WSGI backend.

Measures the production serving surface end-to-end on the attached TPU —
multipart upload, the micro-batching queue (serve/app.py:GenerationService),
one batched KV-cached decode per volley, MIDI cleanup/write — and reports
per-request latency percentiles and steady-state throughput.

The reference backend (``gui/backend/app.py``) reloads the checkpoint and
decodes batch-1 per request; this framework's server loads once and
coalesces concurrent requests into power-of-two decode buckets, so the
interesting numbers are (a) the latency a single user sees and (b) how
throughput scales when ``--concurrency`` users arrive together.

Usage:
  python scripts/serve_bench.py --ckpt /tmp/pbx_real_e2e/result/pretrain/realdata/best \
      --input /tmp/pbx_real_e2e/corpus/Bach/Q4_bwv846_0.mid \
      --concurrency 8 --volleys 4

All decode buckets are PRE-WARMED before the first volley (the round-5
c=8 run proved why: a [2,6] drain mid-benchmark stalled a volley 128 s on
the cold bucket-2 shape, dragging 'steady state' to 0.185 cont/s when the
clean volleys ran at ~15).  The warmup cost is reported separately
(cached in the persistent XLA cache for later runs); steady-state
throughput is the MEDIAN per-volley rate over the post-first volleys, so
one polluted volley cannot swing the headline.  Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _post_upload(base: str, midi_bytes: bytes, name: str) -> str:
    boundary = uuid.uuid4().hex
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="{name}"\r\n'
            f"Content-Type: audio/midi\r\n\r\n").encode() + midi_bytes + \
        f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"{base}/api/upload", data=body, method="POST",
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())["file"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--input", required=True, help="intro .mid file")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--volleys", type=int, default=4,
                    help="concurrent volleys (first = compile, excluded)")
    ap.add_argument("--port", type=int, default=5055)
    ap.add_argument("--window_s", type=float, default=0.25,
                    help="micro-batch gathering window (long enough for a "
                         "whole volley to coalesce into ONE bucket)")
    ap.add_argument("--timeout_s", type=float, default=3600.0,
                    help="per-request timeout (volley 1 includes the "
                         "decode-bucket compile)")
    ap.add_argument("--no_warm", action="store_true",
                    help="skip the decode-bucket pre-warm (first volleys "
                         "then pay compiles at request time)")
    ap.add_argument("--fake", action="store_true",
                    help="CPU smoke mode: a trivial generate_fn replaces "
                         "the model so the HTTP/micro-batch plumbing can "
                         "be exercised without the chip")
    args = ap.parse_args()

    os.chdir(tempfile.mkdtemp(prefix="pbx_serve_bench_"))
    # share the CLI's persistent XLA cache (cli.py:_enable_compile_cache):
    # the decode buckets compile once ever, not once per bench run
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/pianobart_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from pianobart_tpu.serve.app import create_app
    fake_fn = None
    if args.fake:
        def fake_fn(midi_in, midi_out, seed):
            import shutil
            time.sleep(0.05)  # stand-in decode cost
            shutil.copyfile(midi_in, midi_out)
            return True
    app = create_app(ckpt=args.ckpt, generate_fn=fake_fn,
                     max_batch=args.concurrency,
                     batch_window_s=args.window_s)
    threading.Thread(target=app.run,
                     kwargs={"host": "127.0.0.1", "port": args.port},
                     daemon=True).start()
    base = f"http://127.0.0.1:{args.port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(f"{base}/api/health", timeout=5)
            break
        except Exception:
            time.sleep(0.1)

    warm_timings, warm_s = {}, 0.0
    if not (args.no_warm or args.fake):
        t0 = time.perf_counter()
        warm_timings = app.services["pianobart"].warmup()
        warm_s = time.perf_counter() - t0
        print(f"[serve_bench] warmed decode buckets in {warm_s:.1f} s: "
              f"{warm_timings}", file=sys.stderr, flush=True)

    midi_bytes = open(args.input, "rb").read()
    # one upload per client: concurrent generates on a SHARED upload would
    # race on the same output filename (outputs are keyed by model+upload)
    uploads = [_post_upload(base, midi_bytes, f"intro_{i}.mid")
               for i in range(args.concurrency)]
    print(f"[serve_bench] {args.concurrency} uploads done; "
          f"{args.volleys} volleys", file=sys.stderr, flush=True)

    def one(upload: str, out: dict) -> None:
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(
                    f"{base}/api/generate/pianobart/{upload}",
                    timeout=args.timeout_s) as r:
                body = json.loads(r.read())
            out["ok"] = True
            out["served_n"] = body.get("batch_size_served")
        except Exception as exc:
            out["ok"] = False
            out["error"] = str(exc)[:200]
        out["latency_s"] = time.perf_counter() - t0

    volley_stats = []
    for v in range(args.volleys):
        results = [{} for _ in uploads]
        threads = [threading.Thread(target=one, args=(u, r))
                   for u, r in zip(uploads, results)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lats = sorted(r["latency_s"] for r in results)
        ok = sum(1 for r in results if r.get("ok"))
        volley_stats.append({
            "wall_s": round(wall, 3), "ok": ok,
            "p50_s": round(lats[len(lats) // 2], 3),
            "p95_s": round(lats[min(len(lats) - 1,
                                    int(0.95 * len(lats)))], 3),
            "served_n": sorted({r.get("served_n") for r in results
                                if r.get("ok")}),
        })
        print(f"[serve_bench] volley {v}: {volley_stats[-1]}",
              file=sys.stderr, flush=True)

    steady = volley_stats[1:] or volley_stats
    # median per-volley rate: one compile-polluted volley (e.g. an unwarmed
    # bucket shape) cannot swing the headline the way a sum-of-walls did
    rates = sorted(s["ok"] / s["wall_s"] for s in steady if s["wall_s"])
    if not rates:
        value = 0.0
    elif len(rates) % 2:
        value = rates[len(rates) // 2]
    else:  # true median: upper-middle alone biased even counts high
        value = (rates[len(rates) // 2 - 1] + rates[len(rates) // 2]) / 2
    # single-user latency reference: one request alone (bucket 1, warm)
    solo = {}
    one(uploads[0], solo)
    print(json.dumps({
        "metric": "serve_continuations_per_sec",
        "value": round(value, 3),
        "unit": (f"cont/s (median volley rate) over {len(steady)} steady "
                 f"volleys of {args.concurrency} concurrent HTTP requests "
                 f"(p50 {steady[-1]['p50_s']} s, p95 "
                 f"{steady[-1]['p95_s']} s per request; solo request "
                 f"{round(solo['latency_s'], 3)} s; bucket pre-warm "
                 f"{round(warm_s, 1)} s)"),
        "volleys": volley_stats,
        "solo_latency_s": round(solo["latency_s"], 3),
        "warmup_s": round(warm_s, 3),
        "warmup_buckets": warm_timings,
    }), flush=True)


if __name__ == "__main__":
    main()
