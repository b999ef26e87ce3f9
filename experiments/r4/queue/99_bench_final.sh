#!/bin/bash
# End-of-queue bench re-run: verifies bench.py end-to-end on the real chip
# after the round-4 doc/string updates (the driver will also run it at
# round end for BENCH_r04.json).
cd /root/repo
timeout 3000 python bench.py > /tmp/r4_bench_final.log 2>&1
echo "bench rc=$?"
tail -2 /tmp/r4_bench_final.log
