#!/bin/bash
# Fifth re-chain (1-core host, so strictly sequential TPU probes with a
# quiet host during compiles): after the in-flight feast3b tol-1e-8 run
# exits -> well-posed feast57b -> TRUE nP=123 spectrum (Davidson-14) ->
# final nP=123 FEAST window with n_trial=12 against the corrected gold
# -> ccsd389 -> bench cache warm.
cd "$(dirname "$0")/.."
set -u
LOG=/tmp/r5g_queue.log
echo "R5G QUEUE START $(date +%T)" > $LOG
while ! grep -q "PROBE R5 FEAST3B DONE" /tmp/probe_r5_feast3b_tol8.out 2>/dev/null; do
  sleep 30
done
sleep 20
timeout 3000 python -u benchmarks/probe_r5_feast57b.py > /tmp/probe_r5_feast57b.out 2>&1
echo "=== feast57b exit=$? $(date +%T) ===" >> $LOG
timeout 4200 python -u benchmarks/probe_r5_spec123.py > /tmp/probe_r5_spec123.out 2>&1
echo "=== spec123 exit=$? $(date +%T) ===" >> $LOG
R5_MAXIT=5 R5_LEGS=1 R5_LS_TOL=1e-8 R5_NTRIAL=12 R5_GOLD_FILE=/tmp/spec123_roots.npy \
  timeout 7200 python -u benchmarks/probe_r5_feast3b.py > /tmp/probe_r5_feast123_final.out 2>&1
echo "=== feast123_final exit=$? $(date +%T) ===" >> $LOG
timeout 5400 python -u benchmarks/probe_r5_ccsd389.py > /tmp/probe_r5_ccsd389.out 2>&1
echo "=== ccsd389 exit=$? $(date +%T) ===" >> $LOG
timeout 1800 python -u bench.py > /tmp/bench_warm.out 2>&1
echo "=== bench_warm exit=$? $(date +%T) ===" >> $LOG
echo "R5G ALL DONE $(date +%T)" >> $LOG
