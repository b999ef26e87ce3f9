#!/bin/bash
# Round-4 health-gated sequential TPU runner.
#
# The axon relay was down at round-3 end and at round-4 start; this runner
# probes the backend, and once live drains the job queue ONE process at a
# time (the TPU grant is single-tenant). Jobs are numbered scripts in
# $QUEUE — append new ones while the runner is live; finished jobs move to
# /tmp/r4_done (rc recorded in the main log).
set -u
LOG=/tmp/r4_runner.log
QUEUE=/root/repo/experiments/r4/queue
DONE=/tmp/r4_done
mkdir -p "$DONE" "$QUEUE"
cd /root/repo

probe() {
  timeout 240 python -c "
import jax
d = jax.devices()
import jax.numpy as jnp
x = (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
print('PROBE OK', d)
" >> "$LOG" 2>&1
}

echo "=== $(date -u +%F' '%T) runner start" >> "$LOG"
while true; do
  job=$(ls "$QUEUE" 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    echo "$(date -u +%T) queue empty; idle 600s" >> "$LOG"
    sleep 600
    continue
  fi
  until probe; do
    echo "$(date -u +%T) backend unavailable; retry in 300s" >> "$LOG"
    sleep 300
  done
  echo "=== $(date -u +%F' '%T) RUN $job" >> "$LOG"
  bash "$QUEUE/$job" >> "$LOG" 2>&1
  rc=$?
  echo "=== $(date -u +%F' '%T) DONE $job rc=$rc" >> "$LOG"
  mv "$QUEUE/$job" "$DONE/$job"
done
