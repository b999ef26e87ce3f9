#!/bin/bash
# Round-3 queue 6: (a) the one-flag progressive schedule (--fast
# --finish-steps 60000 --finish-coarse 32 --finish-fine 96) on the current
# tree (gsrc default) — also e2e-validates the new flag on real TPU;
# (b) the flat 32+96 occupancy arm at reference length (the "strict win"
# config from the 12k A/B). Kernel/grid-consistent scoring.
set -x
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r3runs
LOG=/tmp/r3_queue6.log

echo "=== TRAIN obj120k-prog2 (one-flag progressive, 60k fast + 60k 32+96)" >> $LOG
timeout 7200 python train_nerf.py -n obj120k-prog2 -s 120000 -r 4096 -rd $RD \
  --kernel fused full -b $SCENE --fast -cr 10 \
  --finish-steps 60000 --finish-coarse 32 --finish-fine 96 >> $LOG 2>&1
echo "=== TRAIN DONE obj120k-prog2 rc=$?" >> $LOG
ck=$(ls $RD/obj120k-prog2/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "=== SCORE obj120k-prog2 ck=$ck" >> $LOG
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
echo "=== SCORE DONE rc=$?" >> $LOG

echo "=== TRAIN obj120k-3296 (flat occupancy 32+96)" >> $LOG
timeout 7200 python train_nerf.py -n obj120k-3296 -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 full -b $SCENE -cr 10 \
  --occupancy -c 32 -f 96 >> $LOG 2>&1
echo "=== TRAIN DONE obj120k-3296 rc=$?" >> $LOG
ck=$(ls $RD/obj120k-3296/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "=== SCORE obj120k-3296 ck=$ck" >> $LOG
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
echo "=== SCORE DONE rc=$?" >> $LOG
echo "ALL_DONE" >> $LOG
