#!/bin/bash
# FIRST TPU ACTION (VERDICT r3 #1): regenerate the driver bench evidence.
cd /root/repo
timeout 2400 python bench.py > /tmp/r4_bench.log 2>&1
rc=$?
echo "bench rc=$rc; JSON:"
tail -1 /tmp/r4_bench.log
exit $rc
