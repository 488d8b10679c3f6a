"""Multi-process data parallelism (the DCN story).

The reference's distributed ceiling is single-process ``nn.DataParallel``
(pretrain.py:63-65) — no process groups, no multi-node.  This framework
scales dp across processes with ``jax.distributed`` and the SAME mesh code
path.  The test spawns two real OS processes, each contributing 2 virtual
CPU devices to one 4-device global mesh, runs two pjit pretrain steps on a
globally-sharded batch, and asserts both processes observe the identical
psum'd loss (scripts/multiproc_dp_worker.py).
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiproc_dp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_identical_global_loss(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""        # CPU only: skip TPU registration
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    outs = [tmp_path / f"p{i}.txt" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)
    ]
    results = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        results.append((p.returncode, err.decode(errors="replace")))
    for rc, err in results:
        # Environment skip ONLY on the worker's dedicated exit code: the
        # worker exits 42 iff jax.distributed.initialize itself raised,
        # before any pianobart_tpu code ran.  Substring-matching stderr
        # (round-2 advisor) could mask genuine mesh/wiring regressions.
        if rc == 42:
            pytest.skip(f"jax.distributed unavailable here: {err[-300:]}")
        assert rc == 0, err[-2000:]

    lines = [o.read_text().split() for o in outs]
    # pid, loss_step0, loss_step1
    assert lines[0][1:] == lines[1][1:], lines
    # the loss moved between steps (training actually happened)
    assert lines[0][1] != lines[0][2]
