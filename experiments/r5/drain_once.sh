#!/bin/bash
# One-shot variant of runner.sh: drain the queue sequentially (health-gated,
# one TPU process at a time) and EXIT when empty — used at end-of-round so
# the TPU is free for the driver's bench.py run. Consumed jobs move to
# /tmp/r5_done; archive into experiments/r5/done/ only after rc is recorded.
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

echo "=== $(date -u +%F' '%T) drain_once start" >> "$LOG"
while true; do
  job=$(ls "$QUEUE" 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    echo "=== $(date -u +%F' '%T) queue empty; drain_once exit" >> "$LOG"
    break
  fi
  tries=0
  until probe; do
    tries=$((tries + 1))
    echo "$(date -u +%T) backend unavailable (try $tries); retry in 120s" >> "$LOG"
    if [ "$tries" -ge 5 ]; then
      echo "=== $(date -u +%F' '%T) backend down 5 probes; drain_once abort" >> "$LOG"
      exit 1
    fi
    sleep 120
  done
  echo "=== $(date -u +%F' '%T) RUN $job" >> "$LOG"
  bash "$QUEUE/$job" >> "$LOG" 2>&1
  rc=$?
  echo "=== $(date -u +%F' '%T) DONE $job rc=$rc" >> "$LOG"
  mv "$QUEUE/$job" "$DONE/$job"
done
