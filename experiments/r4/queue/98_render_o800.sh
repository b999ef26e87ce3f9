#!/bin/bash
# Orbit gif from the production-resolution epoch-faithful headline model
# (o800-prog20), rendered at 400x400 for a reasonable gif size.
cd /root/repo
RD=/tmp/r4runs
ck=$(ls $RD/o800-prog20/checkpoints/*.ckpt 2>/dev/null | sort -t= -k3 -n | tail -1)
echo "render o800-prog20 ck=$ck"
[ -z "$ck" ] && exit 0
timeout 2400 python render.py -c "$ck" -r 16384 -p 20 \
  --height 400 --width 400 -s /tmp/r4render/o800-prog20 \
  > /tmp/r4_render800.log 2>&1
echo "render rc=$?"
gif=$(ls /tmp/r4render/o800-prog20/*-360.gif 2>/dev/null | tail -1)
[ -n "$gif" ] && cp "$gif" media/o800-prog20-120k-360.gif && echo "saved media/o800-prog20-120k-360.gif"
