#!/bin/bash
# VERDICT r3 #5: 3-phase annealed budget schedule on the epoch-faithful
# 100-frame scene — 16+48:60k, 32+96:40k, 64+128:20k (vs the 2-phase
# 60k/60k 32+96 arm and the uniform twin). Target: >=48.3 dB at >=2x the
# uniform twin's effective rate, or a documented negative.
cd /root/repo
SCENE=/tmp/obj100f/scene
RD=/tmp/r4runs
timeout 9000 python train_nerf.py -n o100-sched3 -s 120000 -r 4096 -rd $RD \
  --kernel fused -l auto full -b $SCENE -cr 10 --fast \
  --budget-schedule 16+48:60000,32+96:40000,64+128:20000 \
  > /tmp/r4_o100_sched3.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o100-sched3/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_o100_sched3.log 2>&1
echo "score rc=$?"
grep -E "PSNR|SSIM" /tmp/r4_o100_sched3.log | tail -4
