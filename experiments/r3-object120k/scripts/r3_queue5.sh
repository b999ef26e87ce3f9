#!/bin/bash
# Round-3 queue 5: after queue4 (progressive run) — bin-probe lowering A/B
# (fixed sys.path), then a bench.py sanity run on the current tree.
set -x
cd /root/repo
LOG=/tmp/r3_queue5.log
echo "=== PROBE AB" >> $LOG
timeout 2400 python /tmp/probe_ab.py >> $LOG 2>&1
echo "=== PROBE AB DONE rc=$?" >> $LOG
echo "=== BENCH" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "=== BENCH DONE rc=$?" >> $LOG
echo "ALL_DONE" >> $LOG
