#!/bin/bash
# Round-5 health-gated sequential TPU runner (same design as r4: the axon
# relay can drop for minutes; probe the backend, then drain the job queue
# ONE process at a time — the TPU grant is single-tenant). Jobs are
# numbered scripts in $QUEUE — append while the runner is live; consumed
# jobs move to /tmp/r5_done (rc recorded in the main log), and get
# archived into experiments/r5/done/ in-repo only AFTER execution
# (ADVICE r4: done/ is strictly post-execution provenance).
set -u
LOG=/tmp/r5_runner.log
QUEUE=/root/repo/experiments/r5/queue
DONE=/tmp/r5_done
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
    echo "$(date -u +%T) queue empty; idle 300s" >> "$LOG"
    sleep 300
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
