#!/bin/bash
# VERDICT r3 #8: checkpoint numerics migration. Reproduce the biggest
# measured kernel mismatch (fused-trained 64+128 @ 3k steps, -5.7 dB when
# scored via XLA) and measure the recovery curve of --finetune-steps N
# under the target kernel (--kernel xla).
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r4renum
LOG=/tmp/r4_renum.log
timeout 2400 python train_nerf.py -n renum-base -s 3000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 full -b $SCENE -cr 0 -c 64 -f 128 > $LOG 2>&1
echo "base rc=$?"
ck=$(ls $RD/renum-base/checkpoints/*.ckpt | sort -t= -k3 -n | tail -1)
echo "base ck=$ck"
echo "=== SCORE base fused" >> $LOG
timeout 1200 python score.py -c "$ck" -b $SCENE -r 16384 --kernel fused >> $LOG 2>&1
echo "=== SCORE base xla" >> $LOG
timeout 1200 python score.py -c "$ck" -b $SCENE -r 16384 --kernel xla >> $LOG 2>&1
for N in 100 300 1000; do
  timeout 1200 python train_nerf.py -n renum-ft$N -s 1 -r 4096 -rd $RD \
    --kernel xla --steps-per-call 20 -l "$ck" full -b $SCENE -cr 0 \
    -c 64 -f 128 --finetune-steps $N >> $LOG 2>&1
  echo "ft$N rc=$?"
  ck2=$(ls $RD/renum-ft$N/checkpoints/*.ckpt | sort -t= -k3 -n | tail -1)
  echo "=== SCORE ft$N xla" >> $LOG
  timeout 1200 python score.py -c "$ck2" -b $SCENE -r 16384 --kernel xla >> $LOG 2>&1
done
grep -E "===|PSNR|SSIM" $LOG | tail -40
