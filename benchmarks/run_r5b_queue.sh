#!/bin/bash
# Round-5 resumed TPU probe queue (machine restart wiped /tmp + compile
# cache).  Strictly sequential — one TPU client at a time; never kill a
# TPU client (a killed grant wedges the relay ~15 min).
cd "$(dirname "$0")/.."
set -u
echo "R5B QUEUE START $(date +%T)" > /tmp/r5b_queue.log
R5_MAXIT=5 timeout 10500 python -u benchmarks/probe_r5_feast3b.py > /tmp/probe_r5_feast3b.out 2>&1
echo "=== probe_r5_feast3b exit=$? $(date +%T) ===" >> /tmp/r5b_queue.log
timeout 4200 python -u benchmarks/probe_r5_feast57.py > /tmp/probe_r5_feast57.out 2>&1
echo "=== probe_r5_feast57 exit=$? $(date +%T) ===" >> /tmp/r5b_queue.log
timeout 4500 python -u benchmarks/probe_r5_ccsd389.py > /tmp/probe_r5_ccsd389.out 2>&1
echo "=== probe_r5_ccsd389 exit=$? $(date +%T) ===" >> /tmp/r5b_queue.log
# final: warm the persistent compile cache with the exact driver bench
# programs so the driver's cold-process run sees warm-cache compiles
timeout 1800 python -u bench.py > /tmp/bench_warm.out 2>&1
echo "=== bench_warm exit=$? $(date +%T) ===" >> /tmp/r5b_queue.log
echo "QUEUE DONE $(date +%T)" >> /tmp/r5b_queue.log
