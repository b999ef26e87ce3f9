#!/bin/bash
# Generate the production-resolution epoch-faithful scene: 100 train frames
# (so 120k steps = the reference's exact 1200-epoch LR horizon) at the
# Blender scenes' native 800x800, object scene, seed 0 — the same scene
# family as /tmp/obj100f but at reference resolution.
cd /root/repo
OUT=/tmp/obj100f800/scene
if [ -f "$OUT/transforms_train.json" ]; then
  echo "$OUT present"
else
  timeout 4800 python -m minimal_nerf_tpu.data.procedural \
    --out "$OUT" --size 800 --scene object --train-frames 100 --seed 0
  echo "gen rc=$?"
fi
