#!/bin/sh
# Post-e2e TPU queue (round 3): waits for the e2e matrix process to exit,
# then (1) runs bench.py to confirm the new-defaults headline, (2) sweeps
# batch sizes under the new defaults (B=32 control first, then 36/40/48 —
# B>32 was only ever measured under the OLD flags).
# Usage: nohup sh scripts/post_e2e_queue.sh <e2e_pid> > /tmp/post_e2e.log 2>&1 &
set -u
E2E_PID=${1:?e2e pid}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

while kill -0 "$E2E_PID" 2>/dev/null; do sleep 30; done
echo "=== e2e done, running bench ==="
timeout 3600 python bench.py
echo "=== batch sweep under new defaults ==="
for B in 32 36 40 48 32 36 40 48; do
  echo "--- B=$B ---"
  PBX_LAB_BATCH=$B timeout 3300 python scripts/step_lab.py --child
done
echo "=== queue complete ==="
