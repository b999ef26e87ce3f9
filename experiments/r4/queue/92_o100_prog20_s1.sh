#!/bin/bash
# Seed-variance control for the epoch-faithful headline: the prog 100k/20k
# arm (51.45 dB at seed 0) re-run with --seed 1 (same scene; training seed
# governs init + ray/jitter sampling). Pairs with 94_o100_uni_s1.sh to turn
# the "+0.38 dB over the uniform twin, single seed" claim into a two-seed
# comparison.
cd /root/repo
SCENE=/tmp/obj100f/scene
RD=/tmp/r4runs
timeout 9000 python train_nerf.py -n o100-prog20-s1 -s 120000 -r 4096 -rd $RD \
  --kernel fused --seed 1 -l auto full -b $SCENE -cr 10 --fast \
  --finish-steps 20000 > /tmp/r4_o100_prog20_s1.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o100-prog20-s1/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_o100_prog20_s1.log 2>&1
echo "score rc=$?"
grep -iE "psnr|ssim" /tmp/r4_o100_prog20_s1.log | tail -4
