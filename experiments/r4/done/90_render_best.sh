#!/bin/bash
# Render 360-degree orbit gifs from the two headline epoch-faithful models
# (prog 100k/20k 51.45 dB and 3-phase 51.54 dB) into media/.
cd /root/repo
RD=/tmp/r4runs
for arm in o100-prog20 o100-sched3; do
  ck=$(ls $RD/$arm/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
  echo "render $arm ck=$ck"
  timeout 1800 python render.py -c "$ck" -r 16384 -p 20 \
    --height 200 --width 200 -s /tmp/r4render/$arm \
    >> /tmp/r4_render.log 2>&1
  echo "render rc=$?"
  gif=$(ls /tmp/r4render/$arm/*-360.gif 2>/dev/null | tail -1)
  [ -n "$gif" ] && cp "$gif" "media/${arm}-120k-360.gif" && echo "saved media/${arm}-120k-360.gif"
done
