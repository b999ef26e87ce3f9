#!/bin/bash
# Epoch-faithful pure --fast arm (saturation floor of the 16+48 budget at
# the reference schedule) on the 100-frame scene.
cd /root/repo
SCENE=/tmp/obj100f/scene
RD=/tmp/r4runs
timeout 9000 python train_nerf.py -n o100-fast -s 120000 -r 4096 -rd $RD \
  --kernel fused -l auto full -b $SCENE -cr 10 --fast \
  > /tmp/r4_o100_fast.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o100-fast/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_o100_fast.log 2>&1
echo "score rc=$?"
grep -E "PSNR|SSIM" /tmp/r4_o100_fast.log | tail -4
