#!/bin/bash
# --lr-floor A/B (VERDICT r3 weak #4): the round-3 headline progressive run
# (obj120k-prog2, 20-frame scene, 47.88 dB) re-run with --lr-floor 1e-5.
# On this few-frame scene 120k steps = 6000 epochs, so the per-epoch decay
# reaches ~5e-9 by the end — the floor binds hard in the finish phase;
# comparing vs the recorded prog2 score isolates the flag's quality effect.
cd /root/repo
SCENE=/tmp/obj_ab/scene
RD=/tmp/r4runs
timeout 9000 python train_nerf.py -n obj120k-prog2f -s 120000 -r 4096 -rd $RD \
  --kernel fused -l auto full -b $SCENE --fast -cr 10 --lr-floor 1e-5 \
  --finish-steps 60000 --finish-coarse 32 --finish-fine 96 \
  > /tmp/r4_prog2f.log 2>&1
echo "train rc=$?"
ck=$(ls $RD/obj120k-prog2f/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "score ck=$ck"
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r4_prog2f.log 2>&1
echo "score rc=$?"
grep -E "PSNR|SSIM" /tmp/r4_prog2f.log | tail -4
