#!/bin/bash
# r5 (VERDICT r4 next#2): the deferred seed-1 replicate of the
# production-resolution (800x800) epoch-faithful headline pair, making the
# o800 claim two-seed like the o100 one. Same scene as the r4 seed-0 pair
# (seed variance isolated to training: init + ray/jitter sampling),
# matching the o100 seed-replicate protocol. Originally queued in r4 as
# 110_o800_s1_pair.sh; never ran there (ADVICE r4: its done/ copy was
# premature provenance — removed; this is the real run).
cd /root/repo
RD=/tmp/r5runs
SCENE=/tmp/obj100f800/scene
if [ ! -f "$SCENE/transforms_train.json" ]; then
  timeout 3600 python -m minimal_nerf_tpu.data.procedural \
    --out "$SCENE" --size 800 --scene object --train-frames 100 --seed 0 \
    > /tmp/r5_o800s1_gen.log 2>&1
  echo "gen rc=$?"
fi
timeout 10800 python train_nerf.py -n o800-prog20-s1 -s 120000 -r 4096 -rd $RD \
  --kernel fused --val-render-every 10 --seed 1 -l auto full -b $SCENE -cr 10 \
  --fast --finish-steps 20000 > /tmp/r5_o800_prog20_s1.log 2>&1
echo "train prog rc=$?"
ck=$(ls $RD/o800-prog20-s1/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
timeout 3600 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r5_o800_prog20_s1.log 2>&1
echo "score prog rc=$?"
grep -iE "psnr|ssim" /tmp/r5_o800_prog20_s1.log | tail -2
timeout 14400 python train_nerf.py -n o800-uni-s1 -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 --val-render-every 10 --seed 1 -l auto full \
  -b $SCENE -cr 10 -c 64 -f 128 > /tmp/r5_o800_uni_s1.log 2>&1
echo "train uni rc=$?"
ck=$(ls $RD/o800-uni-s1/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
timeout 3600 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r5_o800_uni_s1.log 2>&1
echo "score uni rc=$?"
grep -iE "psnr|ssim" /tmp/r5_o800_uni_s1.log | tail -2
