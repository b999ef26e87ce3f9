#!/bin/bash
# VERDICT r3 #7: in-run A/B of the VMEM-resident pallas bin probe vs the
# XLA onehot/gather lowerings at fast-recipe shapes.
cd /root/repo
timeout 2400 python experiments/r4/probe_ab3.py > /tmp/r4_probe_ab3.log 2>&1
rc=$?
echo "probe_ab3 rc=$rc"
cat /tmp/r4_probe_ab3.log
exit $rc
