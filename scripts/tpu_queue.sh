#!/bin/bash
# Sequential real-TPU validation queue (strict one-TPU-process rule).
#
# Fire this the moment the tethered worker recovers from an outage; it
# replays every on-device check/measurement in dependency order with tee'd
# logs under /tmp/q_*.log.  Each script starts with its own liveness
# pre-probe (rc=4 fast-fail) so a mid-queue worker relapse stops the queue
# instead of wedging it.
#
#   bash scripts/tpu_queue.sh [logdir]
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-/tmp}
steps=(
  "parity   scripts/tpu_parity_check.py"
  "tunroll  scripts/tunroll_probe.py"
  "roofline scripts/roofline_check.py"
  "bigmap   scripts/bigmap_bench.py"
  "profile  scripts/profile_flagship.py"
  "bench    bench.py"
)
for s in "${steps[@]}"; do
  name=${s%% *}
  script=$(echo "$s" | awk '{print $2}')
  echo "=== $name ($script) $(date -u +%H:%M:%S) ==="
  if ! timeout 2400 python "$script" 2>&1 | tee "$LOG/q_$name.log"; then
    rc=$?
    echo "!!! $name failed rc=$rc — stopping queue (see $LOG/q_$name.log)"
    exit "$rc"
  fi
done
echo "=== queue complete $(date -u +%H:%M:%S) ==="
