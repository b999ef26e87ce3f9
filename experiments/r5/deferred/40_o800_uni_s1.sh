#!/bin/bash
# r5 (VERDICT r4 next#2b, second half): the uniform-twin seed-1 arm of the
# production-resolution (800x800) epoch-faithful pair. The progressive
# seed-1 arm already ran and is archived (51.26 dB,
# experiments/r5/logs/r5_o800_prog20_s1.log.gz, metrics/o800-prog20-s1.csv);
# a host reboot wiped /tmp before this twin could run, so the scene is
# regenerated (deterministic: seed 0, same generator as the r4 seed-0 pair)
# and only the uniform arm remains. Completing it makes BOTH sides of the
# o800 headline two-seed.
cd /root/repo
RD=/tmp/r5runs
SCENE=/tmp/obj100f800/scene
if [ ! -f "$SCENE/transforms_train.json" ]; then
  S=$(date +%s)
  timeout 3600 python -m minimal_nerf_tpu.data.procedural \
    --out "$SCENE" --size 800 --scene object --train-frames 100 --seed 0 \
    > /tmp/r5_o800s1_gen.log 2>&1
  echo "gen rc=$? wall=$(( $(date +%s) - S ))s"
fi
timeout 10800 python train_nerf.py -n o800-uni-s1 -s 120000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 --val-render-every 10 --seed 1 -l auto full \
  -b $SCENE -cr 10 -c 64 -f 128 > /tmp/r5_o800_uni_s1.log 2>&1
echo "train uni rc=$?"
ck=$(ls $RD/o800-uni-s1/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
timeout 3600 python score.py -c "$ck" -b $SCENE -r 16384 >> /tmp/r5_o800_uni_s1.log 2>&1
echo "score uni rc=$?"
grep -iE "psnr|ssim" /tmp/r5_o800_uni_s1.log | tail -2
