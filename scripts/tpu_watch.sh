#!/bin/bash
# Poll the tethered TPU worker until it answers a trivial computation, then
# fire the full sequential validation queue (scripts/tpu_queue.sh).
#
# Strict one-TPU-process rule: the probe runs in its own short-lived
# subprocess (killed on timeout) and the queue only starts after the probe
# process has exited.  Poll interval is generous (240 s) so a wedged worker
# is not hammered while it recovers.
#
#   bash scripts/tpu_watch.sh [max_wait_seconds] [logdir]
set -u
cd "$(dirname "$0")/.."
MAX_WAIT=${1:-10800}
LOG=${2:-/tmp}
START=$(date +%s)
ATTEMPT=0
while :; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "--- probe $ATTEMPT $(date -u +%H:%M:%S) ---"
  timeout 90 python -c "
import jax, jax.numpy as jnp
jnp.ones((8, 8)).sum().block_until_ready()
print('alive:', jax.devices())
" 2>&1 | tail -2
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== worker recovered after $ATTEMPT probes; launching queue ==="
    bash scripts/tpu_queue.sh "$LOG"
    exit $?
  fi
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$MAX_WAIT" ]; then
    echo "=== worker still down after $((NOW - START)) s; giving up ==="
    exit 4
  fi
  sleep 240
done
