"""Smoke test for scripts/serve_bench.py (--fake mode).

Drives the full benchmark flow — threaded WSGI server, multipart uploads,
concurrent /api/generate volleys, JSON summary — with the injectable fake
generate_fn so no model or chip is involved.  The on-TPU numbers live in
ROADMAP.md; this pins the harness itself."""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_serve_bench_fake_mode(tmp_path):
    from pianobart_tpu.midi import (Instrument, MidiFile, Note, TempoChange,
                                    TimeSignature)
    m = MidiFile(ticks_per_beat=480)
    m.tempo_changes = [TempoChange(120.0, 0)]
    m.time_signature_changes = [TimeSignature(4, 4, 0)]
    tr = Instrument(program=0, name="MELODY")
    for i in range(20):
        tr.notes.append(Note(64, 60 + i % 12, i * 240, i * 240 + 200))
    m.instruments = [tr]
    midi = tmp_path / "intro.mid"
    m.dump(str(midi))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "serve_bench.py"),
         "--fake", "--ckpt", "ignored", "--input", str(midi),
         "--concurrency", "3", "--volleys", "2", "--port", "5099"],
        capture_output=True, text=True, timeout=180, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["metric"] == "serve_continuations_per_sec"
    assert summary["value"] > 0
    assert len(summary["volleys"]) == 2
    assert all(v["ok"] == 3 for v in summary["volleys"])
    assert summary["solo_latency_s"] > 0
    # fake mode has no model: the bucket pre-warm must be skipped
    assert summary["warmup_s"] == 0
    assert summary["warmup_buckets"] == {}
