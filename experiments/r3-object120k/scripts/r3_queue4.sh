#!/bin/bash
# Round-3 queue 4: the progressive fast-then-finish schedule at reference
# length. Phase 1: 100k steps at the fast recipe (16+48, occupancy). Phase 2:
# resume the same run for 20k steps at the production budget (64+128,
# occupancy kept so the grid restores). Score kernel/grid-consistently.
set -x
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r3runs
LOG=/tmp/r3_queue4.log

echo "=== TRAIN prog phase1 (fast 100k)" >> $LOG
timeout 5400 python train_nerf.py -n obj120k-prog -s 100000 -r 4096 -rd $RD \
  --kernel fused full -b $SCENE --fast -cr 10 >> $LOG 2>&1
echo "=== TRAIN DONE prog phase1 rc=$?" >> $LOG

echo "=== TRAIN prog phase2 (64+128 finish, resume)" >> $LOG
timeout 5400 python train_nerf.py -n obj120k-prog -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 -l auto full -b $SCENE -cr 0 \
  --occupancy -c 64 -f 128 >> $LOG 2>&1
echo "=== TRAIN DONE prog phase2 rc=$?" >> $LOG

ck=$(ls $RD/obj120k-prog/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "=== SCORE obj120k-prog ck=$ck" >> $LOG
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
echo "=== SCORE DONE rc=$?" >> $LOG
echo "ALL_DONE" >> $LOG
