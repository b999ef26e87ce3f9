#!/bin/bash
# Round-3 queue 3: cross-scoring to attribute the 120k fast-vs-uniform gap
# (44.25 vs 48.60 dB) between sample-count integration error and field quality.
set -x
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r3runs
LOG=/tmp/r3_queue3.log
UNI=$(ls $RD/obj120k-uni/checkpoints/*.ckpt | sort -t= -k3 -n | tail -1)
FAST=$(ls $RD/obj120k-fast/checkpoints/*.ckpt | sort -t= -k3 -n | tail -1)

run() { echo "=== $*" >> $LOG; timeout 1800 "$@" >> $LOG 2>&1; echo "=== DONE rc=$?" >> $LOG; }

# 1) uniform-trained field rendered at the fast budget WITH a baked grid:
#    if this drops to ~44 dB, 16+48 rendering itself caps at ~44 on this scene
run python score.py -c "$UNI" -b $SCENE -r 16384 --coarse 16 --fine 48 --bake-occupancy
# 2) same, uniform 16+48 inference (no grid): separates grid vs budget
run python score.py -c "$UNI" -b $SCENE -r 16384 --coarse 16 --fine 48
# 3) fast-trained field rendered at the production budget (its grid rides along):
#    if this stays ~44 dB, the TRAINED FIELD carries the integration error
run python score.py -c "$FAST" -b $SCENE -r 16384 --coarse 64 --fine 128
# 4) fast-trained field at 32+96 (mid point)
run python score.py -c "$FAST" -b $SCENE -r 16384 --coarse 32 --fine 96
echo "ALL_DONE" >> $LOG
