#!/bin/bash
# r5 (VERDICT r4 next#2): seed-1 replicate of the 3-phase --budget-schedule
# headline arm (r4: 51.54 dB at 1.8x the uniform twin's effective rate,
# seed 0 only). Comparator: the existing r4 seed-1 uniform twin o100-uni-s1
# (51.50 dB) — same scene (seed-0 scene; seed varies only train init/sampling),
# matching the r4 seed-replicate protocol (92/94).
cd /root/repo
RD=/tmp/r5runs
SCENE=/tmp/obj100f/scene
if [ ! -f "$SCENE/transforms_train.json" ]; then
  timeout 2400 python -m minimal_nerf_tpu.data.procedural \
    --out "$SCENE" --size 100 --scene object --train-frames 100 --seed 0 \
    > /tmp/r5_sched3_s1_gen.log 2>&1
  echo "gen rc=$?"
fi
timeout 9000 python train_nerf.py -n o100-sched3-s1 -s 120000 -r 4096 -rd $RD \
  --kernel fused --seed 1 -l auto full -b $SCENE -cr 10 --fast \
  --budget-schedule 16+48:60000,32+96:40000,64+128:20000 \
  > /tmp/r5_sched3_s1.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o100-sched3-s1/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r5_sched3_s1.log 2>&1
echo "score rc=$?"
grep -iE "psnr|ssim" /tmp/r5_sched3_s1.log | tail -2
