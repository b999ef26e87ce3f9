#!/bin/bash
# Epoch-faithful uniform 64+128 twin (the comparator for the progressive
# recipe's quality gap) on the 100-frame scene, 120k steps = 1200 epochs.
# Re-queued: the first attempt put --steps-per-call after the `full`
# subcommand, which the subparser rejects (rc=2).
cd /root/repo
SCENE=/tmp/obj100f/scene
RD=/tmp/r4runs
timeout 10800 python train_nerf.py -n o100-uni -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 -l auto full -b $SCENE -cr 10 \
  -c 64 -f 128 > /tmp/r4_o100_uni.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/o100-uni/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_o100_uni.log 2>&1
echo "score rc=$?"
grep -E "PSNR|SSIM" /tmp/r4_o100_uni.log | tail -4
