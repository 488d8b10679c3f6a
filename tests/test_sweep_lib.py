"""scripts/sweep_lib.py: subprocess sweep scaffolding shared by the perf
labs (step_lab, decode_lab)."""
import statistics
import sys

sys.path.insert(0, "scripts")

from sweep_lib import run_sweep  # noqa: E402

CHILD = """
import json, os, sys
if "--child" in sys.argv:
    v = os.environ.get("LAB_VAL")
    if v == "boom":
        sys.exit(3)
    # each call appends to a counter file so the two sweeps differ
    cnt_path = os.environ["LAB_CNT"] + "." + v
    n = int(open(cnt_path).read()) if os.path.exists(cnt_path) else 0
    open(cnt_path, "w").write(str(n + 1))
    print(json.dumps({"ms": float(v) + n}))
"""


def test_run_sweep_interleaves_and_skips_failures(tmp_path, capsys):
    script = tmp_path / "lab.py"
    script.write_text(CHILD)
    variants = {
        "fast": {"LAB_VAL": "10", "LAB_CNT": str(tmp_path / "c")},
        "bad": {"LAB_VAL": "boom", "LAB_CNT": str(tmp_path / "c")},
        "slow": {"LAB_VAL": "20", "LAB_CNT": str(tmp_path / "c")},
    }
    results = run_sweep(str(script), variants,
                        lambda s, n, o: f"[{s}] {n} {o['ms']}")
    # two sweeps per healthy variant; the failed one is not retried
    assert [o["ms"] for o in results["fast"]] == [10.0, 11.0]
    assert [o["ms"] for o in results["slow"]] == [20.0, 21.0]
    assert results["bad"] == []
    err = capsys.readouterr().out
    assert "bad: FAILED" in err
    # a true median of an even count averages the middle two (the old
    # sorted(xs)[n//2] reported the max of two sweeps)
    assert statistics.median(o["ms"] for o in results["fast"]) == 10.5
