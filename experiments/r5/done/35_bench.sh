#!/bin/bash
# r5 (VERDICT r4 next#7): fresh bench.py on the current tree, mid-round,
# so a driver-independent capture exists even if the round ends inside a
# long queue job. The driver re-runs bench.py on the final tree regardless.
cd /root/repo
timeout 3600 python bench.py > /tmp/r5_bench.log 2>&1
echo "bench rc=$?"
tail -2 /tmp/r5_bench.log
