#!/bin/bash
# (rewritten during the outage) Priority after queue7: finish the
# stall-killed flat-32+96 arm (resumes at step 9400), then a bench sanity.
set -x
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r3runs
LOG=/tmp/r3_queue8.log
echo "=== RESUME obj120k-3296 (stall-killed at 9400)" >> $LOG
timeout 7200 python train_nerf.py -n obj120k-3296 -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 -l auto full -b $SCENE -cr 10 \
  --occupancy -c 32 -f 96 >> $LOG 2>&1
echo "=== TRAIN DONE obj120k-3296 rc=$?" >> $LOG
ck=$(ls $RD/obj120k-3296/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "=== SCORE obj120k-3296 ck=$ck" >> $LOG
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
echo "=== SCORE DONE rc=$?" >> $LOG
echo "=== BENCH final" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "=== BENCH DONE rc=$?" >> $LOG
echo "ALL_DONE" >> $LOG
