#!/bin/bash
# r5 (VERDICT r4 weak#6 / next#6, stage 2/2): measure the batched
# multi-frame scoring/render sweep (views.render_poses_batched, commit
# 7ebb4ca) on TPU at the headline 800x800 resolution. The r4 number being
# replaced is ~2.5 s/frame sequential (one dispatch per frame + host-side
# uint8/PSNR/SSIM round-trips over the ~20ms-latency tunnel). Arms: the
# 100-pose orbit sweep (the reference-scale multi-frame workload,
# /root/reference/score.py:26-37) sequential (--frames-per-dispatch 1) vs
# batched (8) at the production 64+128 budget, plus score.py on the
# 4-frame procedural test split (the host-metric-overlap path).
# Uses the short fused 64+128 ckpt from 45_sb_ckpt.sh — throughput is a
# function of render budget/resolution, not of training length.
# RESUME NOTE: the seq render arm completed before the 22:07 session
# handoff (rc=0 wall=1061s, steady-state 1.78 s/frame); this re-run skips
# arms whose logs already show completion.
cd /root/repo
RD=/tmp/r5runs
SCENE=/tmp/obj8f800/scene
CK=$(ls $RD/sb-ckpt/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
if [ -z "$CK" ]; then echo "NO CKPT — 45_sb_ckpt.sh must run first"; exit 1; fi
echo "ckpt=$CK"
arm() {
  local name=$1; shift
  local S=$(date +%s)
  timeout 2400 "$@" > /tmp/r5_sb_$name.log 2>&1
  local rc=$?
  local E=$(date +%s)
  echo "arm $name rc=$rc wall=$((E-S))s"
}
if [ ! -f /tmp/r5_orbit_seq/epoch=375-360.gif ]; then
  arm render_prod_seq  python render.py -c "$CK" -r 16384 -p 100 -s /tmp/r5_orbit_seq \
      --frames-per-dispatch 1
else
  echo "arm render_prod_seq SKIP (done pre-handoff: rc=0 wall=1061s)"
fi
arm render_prod_b8   python render.py -c "$CK" -r 16384 -p 100 -s /tmp/r5_orbit_b8 \
    --frames-per-dispatch 8
arm score_seq        python score.py -c "$CK" -b $SCENE -r 16384 --frames-per-dispatch 1
arm score_b4         python score.py -c "$CK" -b $SCENE -r 16384 --frames-per-dispatch 4
