#!/bin/bash
# Regenerate the procedural scene fixtures if the sandbox lost /tmp (the
# r3/r4 experiment arms depend on them). No-op when both exist.
cd /root/repo
set -e
for spec in "/tmp/obj100f/scene 100" "/tmp/obj_ab/scene 20"; do
  set -- $spec
  if [ ! -f "$1/transforms_train.json" ]; then
    echo "generating $1 (train_frames=$2)"
    timeout 2400 python -m minimal_nerf_tpu.data.procedural \
      --out "$1" --size 100 --scene object --train-frames "$2" --seed 0
  else
    echo "$1 present"
  fi
done
