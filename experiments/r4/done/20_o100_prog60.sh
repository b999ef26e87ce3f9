#!/bin/bash
# Epoch-faithful progressive 60k/60k (32+96 finish) on the 100-frame object
# scene: 120k steps = 1200 epochs = the reference's full LR-decay horizon
# (nerf_model.py:134-143). This is the round-3 headline recipe re-measured
# under the schedule the reference actually trains with (VERDICT r3 #1).
cd /root/repo
SCENE=/tmp/obj100f/scene
RD=/tmp/r4runs
timeout 9000 python train_nerf.py -n o100-prog60 -s 120000 -r 4096 -rd $RD \
  --kernel fused -l auto full -b $SCENE -cr 10 --fast \
  --finish-steps 60000 --finish-coarse 32 --finish-fine 96 \
  > /tmp/r4_o100_prog60.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o100-prog60/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_o100_prog60.log 2>&1
echo "score rc=$?"
grep -E "PSNR|SSIM" /tmp/r4_o100_prog60.log | tail -4
