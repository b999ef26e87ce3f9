#!/bin/bash
# r5 (VERDICT r4 next#6, stage 1/2): produce the inputs for the batched
# scoring/render measurement after the host reboot wiped /tmp. The
# throughput claim being measured (sequential vs batched multi-frame
# dispatch at 800x800, production 64+128 budget) does not depend on how
# long the checkpoint trained — only on its recorded kernel + budget
# hparams — so instead of re-paying the unfittable 120k-step o800 twin
# (deferred, experiments/r5/deferred/), this trains a SHORT fused
# 64+128 ckpt on a small 8-train-frame 800x800 procedural scene
# (test split = 4 frames, same as the score arms).
cd /root/repo
RD=/tmp/r5runs
SCENE=/tmp/obj8f800/scene
if [ ! -f "$SCENE/transforms_train.json" ]; then
  S=$(date +%s)
  timeout 1800 python -m minimal_nerf_tpu.data.procedural \
    --out "$SCENE" --size 800 --scene object --train-frames 8 --seed 0 \
    > /tmp/r5_sb_gen.log 2>&1
  echo "gen rc=$? wall=$(( $(date +%s) - S ))s"
fi
S=$(date +%s)
timeout 1500 python train_nerf.py -n sb-ckpt -s 3000 -r 4096 -rd $RD \
  --kernel fused --steps-per-call 20 --val-render-every 10 --seed 0 full \
  -b $SCENE -cr 2 -c 64 -f 128 > /tmp/r5_sb_train.log 2>&1
echo "train rc=$? wall=$(( $(date +%s) - S ))s"
ls $RD/sb-ckpt/checkpoints/ 2>/dev/null | tail -3
