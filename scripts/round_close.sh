#!/bin/sh
# Mandatory last TPU action of every round (round-4 verdict do-this #6).
#
# .jax_cache keys include SOURCE LOCATIONS: any committed line shift in a
# traced-path file (models/, ops/, train/, decode.py, bench.py) silently
# invalidates every cached executable, and the driver's end-of-round
# bench.py capture then pays a multi-minute fresh compile (BENCH_r03 died
# on it; BENCH_r04 paid 542 s).  This script re-runs bench.py AFTER the
# last such commit and FAILS LOUDLY unless the warmup line says the
# executable was cached, so a cold cache is caught while there is still
# time to re-warm it (the failing run itself re-warms the cache: re-run
# this script once and it should pass).
#
# Usage: sh scripts/round_close.sh            (from /root/repo, TPU idle)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

LOG=$(mktemp /tmp/round_close.XXXXXX.log)
echo "round_close: running bench.py (log: $LOG)" >&2
timeout 3600 python bench.py >"$LOG" 2>&1
STATUS=$?
cat "$LOG"
if [ "$STATUS" -ne 0 ]; then
    echo "round_close: FAIL — bench.py exited $STATUS" >&2
    exit "$STATUS"
fi
if ! grep -q '"metric"' "$LOG"; then
    echo "round_close: FAIL — no primary JSON line in bench output" >&2
    exit 1
fi
if grep -q "fresh compile" "$LOG"; then
    echo "round_close: FAIL — warmup was a FRESH COMPILE (>120 s)." >&2
    echo "  The cache is warm NOW (this run compiled it); if no traced-path" >&2
    echo "  file changes again, re-run: sh scripts/round_close.sh" >&2
    exit 2
fi
if ! grep -q "cached executable" "$LOG"; then
    echo "round_close: FAIL — warmup classification line missing" >&2
    exit 3
fi
echo "round_close: OK — warmup used a cached executable; driver capture is safe"
