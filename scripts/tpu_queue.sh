#!/bin/bash
# Sequential real-TPU validation queue (strict one-TPU-process rule).
#
# Fire this the moment the tethered worker recovers from an outage; it
# replays every on-device check/measurement in dependency order with tee'd
# logs under /tmp/q_*.log.  Steps do NOT gate each other — a failure in one
# (e.g. a speculative kernel case) must not block the headline artifact
# refresh — except rc=4 ("worker unresponsive" from the liveness
# pre-probe), which aborts the whole queue: the worker relapsed.
#
#   bash scripts/tpu_queue.sh [logdir]
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-/tmp}
# Ordered most-critical-first so a mid-queue worker relapse still leaves
# the round's essential artifacts behind: parity gates every kernel claim,
# bench is the headline row, bigmap carries the routing-decision rows.
steps=(
  "parity   scripts/tpu_parity_check.py"
  "bench    bench.py"
  "bigmap   scripts/bigmap_bench.py"
  "tunroll  scripts/tunroll_probe.py"
  "roofline scripts/roofline_check.py"
  "profile  scripts/profile_flagship.py"
  "models   scripts/model_bench.py"
  "serve    scripts/serve_bench.py"
)
failed=""
for s in "${steps[@]}"; do
  name=${s%% *}
  script=$(echo "$s" | awk '{print $2}')
  echo "=== $name ($script) $(date -u +%H:%M:%S) ==="
  timeout 3600 python "$script" 2>&1 | tee "$LOG/q_$name.log"
  rc=$?
  if [ "$rc" -eq 4 ]; then
    echo "!!! worker relapsed during $name — aborting queue"
    exit 4
  elif [ "$rc" -ne 0 ]; then
    echo "!!! $name failed rc=$rc (see $LOG/q_$name.log) — continuing"
    failed="$failed $name:rc=$rc"
  fi
done
if [ -n "$failed" ]; then
  echo "=== queue complete WITH FAILURES:$failed $(date -u +%H:%M:%S) ==="
  exit 1
fi
echo "=== queue complete $(date -u +%H:%M:%S) ==="
