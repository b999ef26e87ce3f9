#!/bin/bash
# Cross-archetype generality sweep: fast (occupancy 16+48) vs uniform
# 64+128 at 12k steps (the pre-saturation protocol from the r3 object-scene
# A/B) on the three remaining occupancy archetypes — 'field' (dense),
# 'thin' (ficus/mic-like branches), 'shell' (hollow ship-like surface).
# The 'object' archetype already has the full 120k epoch-faithful arms.
# 20 train frames, 100x100, seed 0, scored at each model's trained budget.
cd /root/repo
RD=/tmp/r4runs
for arch in thin shell field; do
  SCENE=/tmp/sw_${arch}/scene
  if [ ! -f "$SCENE/transforms_train.json" ]; then
    timeout 2400 python -m minimal_nerf_tpu.data.procedural \
      --out "$SCENE" --size 100 --scene "$arch" --train-frames 20 --seed 0 \
      > /tmp/r4_sw_${arch}_gen.log 2>&1
    echo "gen $arch rc=$?"
  fi
  for arm in fast uni; do
    LOG=/tmp/r4_sw_${arch}_${arm}.log
    if [ "$arm" = fast ]; then
      timeout 3600 python train_nerf.py -n sw-$arch-fast -s 12000 -r 4096 \
        -rd $RD --kernel fused full -b $SCENE -cr 10 --fast > $LOG 2>&1
    else
      timeout 5400 python train_nerf.py -n sw-$arch-uni -s 12000 -r 4096 \
        -rd $RD --kernel fused --steps-per-call 20 full -b $SCENE -cr 10 \
        -c 64 -f 128 > $LOG 2>&1
    fi
    echo "train $arch/$arm rc=$?"
    ck=$(ls $RD/sw-$arch-$arm/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
    timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
    echo "score $arch/$arm rc=$?"
    grep -iE "psnr|ssim" $LOG | tail -2
  done
done
