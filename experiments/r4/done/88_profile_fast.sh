#!/bin/bash
# Re-run the fast-step profile capture (job 80's second half failed on the
# then-missing scene): 400 fast-recipe steps with a jax.profiler trace.
cd /root/repo
SCENE=/tmp/obj_ab/scene
timeout 1800 python train_nerf.py -n prof-fast -s 400 -r 4096 -rd /tmp/profr4 \
  --kernel fused --profile /tmp/fastprof_r4 full -b $SCENE --fast -cr 0 \
  > /tmp/r4_prof.log 2>&1
echo "profile rc=$?"
tail -2 /tmp/r4_prof.log
