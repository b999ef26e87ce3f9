#!/bin/bash
# Production-resolution epoch-faithful headline: prog 100k/20k at 800x800
# (the 51.45 dB seed-0 recipe from the 100x100 arm set, now at the Blender
# scenes' native resolution). --val-render-every 10 trims recon-image
# renders at this resolution (val losses still run every validation).
cd /root/repo
SCENE=/tmp/obj100f800/scene
RD=/tmp/r4runs
timeout 10800 python train_nerf.py -n o800-prog20 -s 120000 -r 4096 -rd $RD \
  --kernel fused --val-render-every 10 -l auto full -b $SCENE -cr 10 \
  --fast --finish-steps 20000 > /tmp/r4_o800_prog20.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o800-prog20/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 3600 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_o800_prog20.log 2>&1
echo "score rc=$?"
grep -iE "psnr|ssim" /tmp/r4_o800_prog20.log | tail -4
