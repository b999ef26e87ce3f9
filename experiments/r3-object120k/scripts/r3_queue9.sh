#!/bin/bash
# (rewritten during the outage) Nice-to-haves, each gated on remaining wall
# time (driver wall ends ~05:50 UTC): 800x800 refresh + fast-step profile,
# then the lr-floor A/B arms.
set -x
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r3runs
LOG=/tmp/r3_queue9.log
before() { [ "$(date +%s)" -lt "$(date -d "$1" +%s)" ]; }

if before "2026-08-18 03:45"; then
  echo "=== 800x800 fast (new defaults)" >> $LOG
  timeout 3000 python examples/demo_procedural.py --out /tmp/occ800b --name occ800-fast-r3 \
    --rays 4096 --kernel fused --steps-per-call 20 --steps 4000 --size 800 \
    --coarse 16 --fine 48 --occupancy --scene object --cr 10 >> $LOG 2>&1
  echo "=== DONE 800 rc=$?" >> $LOG
  echo "=== PROFILE fast step (one-hot)" >> $LOG
  timeout 1800 python train_nerf.py -n prof-fast -s 400 -r 4096 -rd /tmp/profr3 \
    --kernel fused --profile /tmp/fastprof_r3 full -b $SCENE --fast \
    -cr 0 >> $LOG 2>&1
  echo "=== PROFILE DONE rc=$?" >> $LOG
fi

if before "2026-08-18 03:00"; then
  echo "=== TRAIN obj120k-prog2f (progressive + lr-floor)" >> $LOG
  timeout 7200 python train_nerf.py -n obj120k-prog2f -s 120000 -r 4096 -rd $RD \
    --kernel fused full -b $SCENE --fast -cr 10 --lr-floor 1e-5 \
    --finish-steps 60000 --finish-coarse 32 --finish-fine 96 >> $LOG 2>&1
  echo "=== TRAIN DONE obj120k-prog2f rc=$?" >> $LOG
  ck=$(ls $RD/obj120k-prog2f/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
  echo "=== SCORE obj120k-prog2f ck=$ck" >> $LOG
  timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
  echo "=== SCORE DONE rc=$?" >> $LOG
fi

if before "2026-08-18 02:00"; then
  echo "=== TRAIN obj120k-unif (uniform + lr-floor)" >> $LOG
  timeout 10800 python train_nerf.py -n obj120k-unif -s 120000 -r 4096 -rd $RD \
    --kernel fused --steps-per-call 20 full -b $SCENE -cr 10 --lr-floor 1e-5 \
    -c 64 -f 128 >> $LOG 2>&1
  echo "=== TRAIN DONE obj120k-unif rc=$?" >> $LOG
  ck=$(ls $RD/obj120k-unif/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
  echo "=== SCORE obj120k-unif ck=$ck" >> $LOG
  timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
  echo "=== SCORE DONE rc=$?" >> $LOG
fi
echo "ALL_DONE" >> $LOG
