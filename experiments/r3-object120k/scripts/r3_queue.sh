#!/bin/bash
# Round-3 quality-evidence queue — sequential, ONE TPU process at a time.
set -x
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r3runs
LOG=/tmp/r3_queue.log
mkdir -p $RD

score_latest() {
  name=$1
  ck=$(ls $RD/$name/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
  echo "=== SCORE $name ck=$ck" >> $LOG
  timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
  echo "=== SCORE DONE $name rc=$?" >> $LOG
}

# 1) fast recipe at reference length (VERDICT #1 arm A; occ_fraction curve = VERDICT #3 evidence)
echo "=== TRAIN obj120k-fast" >> $LOG
timeout 5400 python train_nerf.py -n obj120k-fast -s 120000 -r 4096 -rd $RD \
  --kernel fused full -b $SCENE --fast -cr 10 >> $LOG 2>&1
echo "=== TRAIN DONE obj120k-fast rc=$?" >> $LOG
score_latest obj120k-fast

# 2) uniform 64+128 twin (VERDICT #1 arm B) — same scene/seed
echo "=== TRAIN obj120k-uni" >> $LOG
timeout 10800 python train_nerf.py -n obj120k-uni -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 full -b $SCENE -c 64 -f 128 -cr 10 >> $LOG 2>&1
echo "=== TRAIN DONE obj120k-uni rc=$?" >> $LOG
score_latest obj120k-uni

# 3) rel_threshold=0 control (round-2 behavior) for the occ-creep A/B (VERDICT #3)
echo "=== TRAIN obj120k-rel0" >> $LOG
timeout 5400 python train_nerf.py -n obj120k-rel0 -s 120000 -r 4096 -rd $RD \
  --kernel fused full -b $SCENE --fast -cr 10 --occ-rel-threshold 0 >> $LOG 2>&1
echo "=== TRAIN DONE obj120k-rel0 rc=$?" >> $LOG
score_latest obj120k-rel0

# 4+5) XLA-kernel twins on the field scene (VERDICT #2; fused counterparts already measured)
echo "=== DEMO xla-3k" >> $LOG
timeout 2400 python examples/demo_procedural.py --out /tmp/occ_ab --name xla-3k \
  --steps 3000 --size 100 --rays 4096 --kernel xla --steps-per-call 20 \
  --coarse 64 --fine 128 >> $LOG 2>&1
echo "=== DEMO DONE xla-3k rc=$?" >> $LOG
echo "=== DEMO xla-12k" >> $LOG
timeout 7200 python examples/demo_procedural.py --out /tmp/occ_ab --name xla-12k \
  --steps 12000 --size 100 --rays 4096 --kernel xla --steps-per-call 20 \
  --coarse 64 --fine 128 >> $LOG 2>&1
echo "=== DEMO DONE xla-12k rc=$?" >> $LOG
echo "ALL_DONE" >> $LOG
