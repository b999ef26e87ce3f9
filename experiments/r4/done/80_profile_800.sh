#!/bin/bash
# Nice-to-haves from round-3 queue9: 800x800 fast-recipe refresh on the
# current defaults, then a fast-step profile capture (one-hot probe).
cd /root/repo
SCENE=/tmp/obj_ab/scene
timeout 3000 python examples/demo_procedural.py --out /tmp/occ800r4 --name occ800-fast-r4 \
  --rays 4096 --kernel fused --steps-per-call 20 --steps 4000 --size 800 \
  --coarse 16 --fine 48 --occupancy --scene object --cr 10 \
  > /tmp/r4_800.log 2>&1
echo "800x800 rc=$?"
tail -3 /tmp/r4_800.log
timeout 1800 python train_nerf.py -n prof-fast -s 400 -r 4096 -rd /tmp/profr4 \
  --kernel fused --profile /tmp/fastprof_r4 full -b $SCENE --fast -cr 0 \
  > /tmp/r4_prof.log 2>&1
echo "profile rc=$?"
