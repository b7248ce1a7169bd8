#!/bin/bash
# Fourth re-chain: feast57 (in flight) -> feast3b at ls tol 1e-8 ->
# well-posed feast57b window -> ccsd389 -> bench cache warm.
cd "$(dirname "$0")/.."
set -u
LOG=/tmp/r5f_queue.log
echo "R5F QUEUE START $(date +%T)" > $LOG
while ! grep -q "PROBE R5 FEAST57 DONE" /tmp/probe_r5_feast57.out 2>/dev/null; do
  sleep 30
done
sleep 30
R5_MAXIT=4 R5_LEGS=1 R5_LS_TOL=1e-8 timeout 5400 python -u benchmarks/probe_r5_feast3b.py > /tmp/probe_r5_feast3b_tol8.out 2>&1
echo "=== feast3b_tol8 exit=$? $(date +%T) ===" >> $LOG
timeout 3000 python -u benchmarks/probe_r5_feast57b.py > /tmp/probe_r5_feast57b.out 2>&1
echo "=== feast57b exit=$? $(date +%T) ===" >> $LOG
timeout 5400 python -u benchmarks/probe_r5_ccsd389.py > /tmp/probe_r5_ccsd389.out 2>&1
echo "=== ccsd389 exit=$? $(date +%T) ===" >> $LOG
timeout 1800 python -u bench.py > /tmp/bench_warm.out 2>&1
echo "=== bench_warm exit=$? $(date +%T) ===" >> $LOG
echo "R5F ALL DONE $(date +%T)" >> $LOG
