#!/bin/bash
# Reordered round-5 queue (replaces run_r5b_queue.sh after its wrapper
# was stopped — the TPU client itself was never touched).  Waits for the
# in-flight feast3b (old code) to exit, then runs the highest-value
# probes first: feast3b with the SVD-truncation fix (7fcfacd), feast57,
# ccsd389, and a final bench.py pass to warm the persistent compile
# cache for the driver.  One TPU client at a time, strictly sequential.
cd "$(dirname "$0")/.."
set -u
LOG=/tmp/r5d_queue.log
echo "R5D QUEUE START $(date +%T)" > $LOG
while ! grep -q "PROBE R5 FEAST3B DONE" /tmp/probe_r5_feast3b.out 2>/dev/null; do
  sleep 30
done
sleep 30   # let the client release the grant cleanly
R5_MAXIT=4 R5_LEGS=1 timeout 4000 python -u benchmarks/probe_r5_feast3b.py > /tmp/probe_r5_feast3b_fix.out 2>&1
echo "=== feast3b_fix exit=$? $(date +%T) ===" >> $LOG
timeout 4200 python -u benchmarks/probe_r5_feast57.py > /tmp/probe_r5_feast57.out 2>&1
echo "=== feast57 exit=$? $(date +%T) ===" >> $LOG
timeout 5400 python -u benchmarks/probe_r5_ccsd389.py > /tmp/probe_r5_ccsd389.out 2>&1
echo "=== ccsd389 exit=$? $(date +%T) ===" >> $LOG
timeout 1800 python -u bench.py > /tmp/bench_warm.out 2>&1
echo "=== bench_warm exit=$? $(date +%T) ===" >> $LOG
echo "R5D ALL DONE $(date +%T)" >> $LOG
