#!/bin/bash
# Resume the stall-killed flat-32+96 arm (round-3 queue8): from-scratch
# 32+96 comparator for the progressive schedule, 20-frame object scene.
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r3runs
timeout 10800 python train_nerf.py -n obj120k-3296 -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 -l auto full -b $SCENE -cr 10 \
  --occupancy -c 32 -f 96 > /tmp/r4_3296.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/obj120k-3296/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_3296.log 2>&1
echo "score rc=$?"
grep -E "PSNR|SSIM" /tmp/r4_3296.log | tail -4
