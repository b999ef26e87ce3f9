#!/bin/bash
# r5: mitigation/attribution arms for the thin/shell fast-recipe gap found
# by the r4 cross-archetype sweep (thin: fast 43.84 vs uni 47.22 dB;
# shell: 43.45 vs 46.34; field at parity). Same 12k-step protocol.
# Arms:
#  - thin/fast-occ128:  is the gap the 64^3 occupancy grid under-resolving
#    thin structure? (VERDICT r4 next#1 mitigation arm)
#  - shell/fast-occ128: same question on the hollow-shell archetype
#  - thin/fast-noocc:   16+48 WITHOUT the occupancy grid — separates the
#    sample-budget contribution from the grid-culling contribution
cd /root/repo
RD=/tmp/r5runs
mkdir -p $RD
run_arm() {  # run_arm <arch> <name> <extra train flags...>
  local arch=$1 name=$2; shift 2
  local SCENE=/tmp/sw_${arch}/scene
  if [ ! -f "$SCENE/transforms_train.json" ]; then
    timeout 2400 python -m minimal_nerf_tpu.data.procedural \
      --out "$SCENE" --size 100 --scene "$arch" --train-frames 20 --seed 0 \
      > /tmp/r5_${name}_gen.log 2>&1
    echo "gen $arch rc=$?"
  fi
  local LOG=/tmp/r5_${name}.log
  timeout 3600 python train_nerf.py -n $name -s 12000 -r 4096 -rd $RD \
    --kernel fused full -b $SCENE -cr 10 --fast "$@" > $LOG 2>&1
  echo "train $name rc=$?"
  ck=$(ls $RD/$name/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
  timeout 1800 python score.py -c "$ck" -b $SCENE -r 16384 >> $LOG 2>&1
  echo "score $name rc=$?"
  grep -iE "psnr|ssim" $LOG | tail -2
}
run_arm thin  sw-thin-occ128  --occ-resolution 128
run_arm shell sw-shell-occ128 --occ-resolution 128
run_arm thin  sw-thin-noocc   --no-occupancy
