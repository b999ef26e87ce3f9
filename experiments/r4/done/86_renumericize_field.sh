#!/bin/bash
# VERDICT r3 #8, take 2: job 85 ran on the OBJECT scene, where the
# fused-vs-XLA scoring mismatch turned out to be only -0.07 dB at 3k steps
# (result recorded in PERFORMANCE.md "Kernel consistency"). The -5.7 dB row
# in that table was measured on the procedural FIELD scene (dense volumetric
# density everywhere, no empty background) — rerun the recovery-curve
# protocol there so --finetune-steps is measured against a real mismatch.
cd /root/repo
SCENE=/tmp/field_ab/scene
RD=/tmp/r4renumf
LOG=/tmp/r4_renumf.log
if [ ! -f "$SCENE/transforms_train.json" ]; then
  timeout 2400 python -m minimal_nerf_tpu.data.procedural \
    --out "$SCENE" --size 100 --scene field --train-frames 20 --seed 0
fi
timeout 2400 python train_nerf.py -n renumf-base -s 3000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 full -b $SCENE -cr 0 -c 64 -f 128 > $LOG 2>&1
echo "base rc=$?"
ck=$(ls $RD/renumf-base/checkpoints/*.ckpt | sort -t= -k3 -n | tail -1)
echo "base ck=$ck"
echo "=== SCORE base fused" >> $LOG
timeout 1200 python score.py -c "$ck" -b $SCENE -r 16384 --kernel fused >> $LOG 2>&1
echo "=== SCORE base xla" >> $LOG
timeout 1200 python score.py -c "$ck" -b $SCENE -r 16384 --kernel xla >> $LOG 2>&1
for N in 100 300 1000; do
  timeout 1200 python train_nerf.py -n renumf-ft$N -s 1 -r 4096 -rd $RD \
    --kernel xla --steps-per-call 20 -l "$ck" full -b $SCENE -cr 0 \
    -c 64 -f 128 --finetune-steps $N >> $LOG 2>&1
  echo "ft$N rc=$?"
  ck2=$(ls $RD/renumf-ft$N/checkpoints/*.ckpt | sort -t= -k3 -n | tail -1)
  echo "=== SCORE ft$N xla" >> $LOG
  timeout 1200 python score.py -c "$ck2" -b $SCENE -r 16384 --kernel xla >> $LOG 2>&1
done
grep -E "===|psnr|ssim" $LOG | tail -40
