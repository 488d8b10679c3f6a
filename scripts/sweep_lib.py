"""Shared subprocess-sweep scaffolding for the perf labs (step_lab.py,
decode_lab.py).

The experiment flags are frozen at import (env is not a jit cache key), so
each variant measures in its OWN child process; the parent interleaves all
variants over ``sweeps`` passes (compile caches make later passes cheap) and
aggregates with a true median (``statistics.median`` — the middle two are
averaged for even counts; an earlier hand-rolled ``sorted(xs)[n//2]`` picked
the WORSE of two sweeps).

The remote compile helper is serial AND fragile: killing a client mid-compile
leaves its request grinding and wedges every subsequent compile for
~30-60 min.  So: strictly serial children, a generous per-child budget, and
later sweeps only re-measure variants that already succeeded (their
executables are cached).
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from typing import Callable, Dict, List, Optional

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_sweep(
    script: str,
    variants: Dict[str, Dict[str, str]],
    line_fmt: Callable[[int, str, dict], str],
    sweeps: int = 2,
    timeout: int = 3300,
) -> Dict[str, List[dict]]:
    """Run ``script --child`` once per (sweep, variant); return per-variant
    lists of the child's last-line JSON dicts (failed runs are absent)."""
    results: Dict[str, List[dict]] = {k: [] for k in variants}
    for sweep in range(sweeps):
        for name, flags in variants.items():
            if sweep > 0 and not results[name]:
                continue  # don't re-pay a failed/pathological compile
            env = dict(os.environ)
            env.update(flags)
            env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
            try:
                p = subprocess.run(
                    [sys.executable, os.path.abspath(script), "--child"],
                    env=env, capture_output=True, text=True, timeout=timeout)
            except subprocess.TimeoutExpired:
                print(f"[{sweep}] {name}: TIMEOUT (>{timeout} s — likely "
                      f"stuck in compile); skipping", flush=True)
                continue
            if p.returncode != 0:
                print(f"[{sweep}] {name}: FAILED\n{p.stderr[-2000:]}",
                      flush=True)
                continue
            out = json.loads(p.stdout.strip().splitlines()[-1])
            results[name].append(out)
            print(line_fmt(sweep, name, out), flush=True)
    return results


def print_medians(results: Dict[str, List[dict]], key: str, unit: str,
                  extra: Optional[Callable[[List[dict]], str]] = None) -> None:
    print("\nmedians:")
    for name, outs in results.items():
        if not outs:
            continue
        med = statistics.median(o[key] for o in outs)
        tail = f"  {extra(outs)}" if extra else ""
        print(f"  {name:7s} {med:7.3f} {unit}{tail}")
