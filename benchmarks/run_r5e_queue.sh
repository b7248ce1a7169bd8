#!/bin/bash
# Third re-chain of the round-5 queue: after the in-flight feast57
# exits, run the decisive nP=123 experiment (ls_conv_tol=1e-8 — the
# resolvent-amplified-solve-noise hypothesis: FEAST's near-axis contour
# nodes amplify the 1e-6 residuals into O(1e-2) subspace pollution;
# RT's nodes sit up the imaginary axis, which is why the same engine
# holds 2.6e-9 on the RT trace), then ccsd389, then the bench cache
# warm.  One TPU client at a time; wrappers are killed, clients never.
cd "$(dirname "$0")/.."
set -u
LOG=/tmp/r5e_queue.log
echo "R5E QUEUE START $(date +%T)" > $LOG
while ! grep -q "PROBE R5 FEAST57 DONE" /tmp/probe_r5_feast57.out 2>/dev/null; do
  sleep 30
done
sleep 30
R5_MAXIT=4 R5_LEGS=1 R5_LS_TOL=1e-8 timeout 5400 python -u benchmarks/probe_r5_feast3b.py > /tmp/probe_r5_feast3b_tol8.out 2>&1
echo "=== feast3b_tol8 exit=$? $(date +%T) ===" >> $LOG
timeout 5400 python -u benchmarks/probe_r5_ccsd389.py > /tmp/probe_r5_ccsd389.out 2>&1
echo "=== ccsd389 exit=$? $(date +%T) ===" >> $LOG
timeout 1800 python -u bench.py > /tmp/bench_warm.out 2>&1
echo "=== bench_warm exit=$? $(date +%T) ===" >> $LOG
echo "R5E ALL DONE $(date +%T)" >> $LOG
