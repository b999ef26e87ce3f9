#!/bin/bash
# Round-3 queue 2: probe-lowering A/B, then the grid-source 120k A/B arm.
set -x
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r3runs
LOG=/tmp/r3_queue2.log

# 1) bin-probe lowering: gather vs onehot, in-run at fast-recipe shapes
echo "=== PROBE AB" >> $LOG
timeout 2400 python /tmp/probe_ab.py >> $LOG 2>&1
echo "=== PROBE AB DONE rc=$?" >> $LOG

# 2) grid-source A/B arm: identical to obj120k-fast but the EMA grid fed by
#    the coarse net only (the well-supervised field). Also measures the
#    batched-fetch wall-time win at reference length (arm A predates the fix).
echo "=== TRAIN obj120k-gsrc" >> $LOG
timeout 5400 python train_nerf.py -n obj120k-gsrc -s 120000 -r 4096 -rd $RD \
  --kernel fused full -b $SCENE --fast -cr 10 --occ-grid-source coarse >> $LOG 2>&1
echo "=== TRAIN DONE obj120k-gsrc rc=$?" >> $LOG
ck=$(ls $RD/obj120k-gsrc/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "=== SCORE obj120k-gsrc ck=$ck" >> $LOG
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
echo "=== SCORE DONE obj120k-gsrc rc=$?" >> $LOG
echo "ALL_DONE" >> $LOG
