#!/bin/bash
# Production-resolution epoch-faithful uniform 64+128 twin (comparator for
# 96_o800_prog20). Same protocol, same scene, same seed.
cd /root/repo
SCENE=/tmp/obj100f800/scene
RD=/tmp/r4runs
timeout 14400 python train_nerf.py -n o800-uni -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 --val-render-every 10 -l auto full \
  -b $SCENE -cr 10 -c 64 -f 128 > /tmp/r4_o800_uni.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o800-uni/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 3600 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_o800_uni.log 2>&1
echo "score rc=$?"
grep -iE "psnr|ssim" /tmp/r4_o800_uni.log | tail -4
