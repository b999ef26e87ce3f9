#!/bin/bash
# r5 parity sequence (CPU-only, niced — shares the single core with the
# TPU queue's host process). Priority order: the NEW multiframe evidence
# first, then the two extended pinned seeds, then the multiframe seed-1
# replicate. Incremental CSV/sidecar writes mean a run cut off by the
# round end still leaves a usable curve.
set -u
cd /root/repo
H=experiments/r5-parity/trajectory_parity.py
O=/tmp/r5_parity
mkdir -p $O
run() {
  echo "=== $(date -u +%F' '%T) START $*"
  nice -n 19 python $H "$@"
  echo "=== $(date -u +%F' '%T) DONE rc=$? $*"
}
run --arm multiframe --steps 600 --seed 0 --out $O/mf_s0
run --arm pinned --steps 2000 --seed 0 --out $O/pinned_s0
run --arm pinned --steps 2000 --seed 1 --out $O/pinned_s1
run --arm multiframe --steps 600 --seed 1 --out $O/mf_s1
echo "=== $(date -u +%F' '%T) ALL DONE"
