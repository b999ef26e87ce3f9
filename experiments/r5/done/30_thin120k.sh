#!/bin/bash
# r5 (VERDICT r4 next#1, second half): extend the WORST archetype from the
# cross-archetype sweep (thin: fast lost 3.38 dB to uniform at 12k) to one
# epoch-faithful 120k progressive-vs-twin pair — does the progressive
# recipe's uniform 64+128 finish phase close the thin-structure gap the
# fast phase opens? 100 train frames, 100x100, seed 0, same protocol as
# the r4 o100 object-scene arms (120k steps = the reference's 1200-epoch
# LR horizon at 100 steps/epoch).
cd /root/repo
RD=/tmp/r5runs
SCENE=/tmp/thin100f/scene
if [ ! -f "$SCENE/transforms_train.json" ]; then
  timeout 2400 python -m minimal_nerf_tpu.data.procedural \
    --out "$SCENE" --size 100 --scene thin --train-frames 100 --seed 0 \
    > /tmp/r5_thin120k_gen.log 2>&1
  echo "gen rc=$?"
fi
timeout 9000 python train_nerf.py -n thin100-prog20 -s 120000 -r 4096 -rd $RD \
  --kernel fused -l auto full -b $SCENE -cr 10 --fast --finish-steps 20000 \
  > /tmp/r5_thin_prog20.log 2>&1
echo "train prog rc=$?"
ck=$(ls $RD/thin100-prog20/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r5_thin_prog20.log 2>&1
echo "score prog rc=$?"
grep -iE "psnr|ssim" /tmp/r5_thin_prog20.log | tail -2
timeout 10800 python train_nerf.py -n thin100-uni -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 -l auto full -b $SCENE -cr 10 \
  -c 64 -f 128 > /tmp/r5_thin_uni.log 2>&1
echo "train uni rc=$?"
ck=$(ls $RD/thin100-uni/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r5_thin_uni.log 2>&1
echo "score uni rc=$?"
grep -iE "psnr|ssim" /tmp/r5_thin_uni.log | tail -2
