#!/bin/bash
# Seed-variance control: the epoch-faithful uniform 64+128 twin (51.07 dB
# at seed 0) re-run with --seed 1. See 92_o100_prog20_s1.sh.
cd /root/repo
SCENE=/tmp/obj100f/scene
RD=/tmp/r4runs
timeout 10800 python train_nerf.py -n o100-uni-s1 -s 120000 -r 4096 -rd $RD \
  --kernel fused --seed 1 --steps-per-call 20 -l auto full -b $SCENE -cr 10 \
  -c 64 -f 128 > /tmp/r4_o100_uni_s1.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o100-uni-s1/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_o100_uni_s1.log 2>&1
echo "score rc=$?"
grep -iE "psnr|ssim" /tmp/r4_o100_uni_s1.log | tail -4
