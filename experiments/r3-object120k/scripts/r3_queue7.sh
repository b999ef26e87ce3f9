#!/bin/bash
# Round-3 queue 7 (time-adaptive rewrite during the outage): the
# epoch-faithful reference-length set on the 100-frame object scene
# (120k steps = 1200 epochs = the reference ship recipe's LR schedule).
# If recovery comes late, run 60k-step arms instead (600 epochs; the
# progressive switch still lands at a healthy LR) so all three arms fit.
set -x
cd /root/repo
SCENE=/tmp/obj100f/scene
RD=/tmp/r3runs
LOG=/tmp/r3_queue7.log

if [ "$(date +%s)" -lt "$(date -d '2026-08-18 02:00' +%s)" ]; then
  TOTAL=120000; FINISH=20000; SUF=""
else
  TOTAL=60000; FINISH=10000; SUF="-60k"
fi
echo "=== PLAN total=$TOTAL finish=$FINISH" >> $LOG

train() {
  name=$1; shift
  echo "=== TRAIN $name" >> $LOG
  timeout 9000 python train_nerf.py -n $name -s $TOTAL -r 4096 -rd $RD \
    --kernel fused full -b $SCENE -cr 10 "$@" >> $LOG 2>&1
  echo "=== TRAIN DONE $name rc=$?" >> $LOG
  ck=$(ls $RD/$name/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
  echo "=== SCORE $name ck=$ck" >> $LOG
  timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
  echo "=== SCORE DONE $name rc=$?" >> $LOG
}

train o100-fast$SUF --fast
train o100-prog$SUF --fast --finish-steps $FINISH
train o100-uni$SUF --steps-per-call 20 -c 64 -f 128
echo "ALL_DONE" >> $LOG
