#!/bin/bash
# Chained after run_r5b_queue.sh: re-run feast3b with the SVD-truncation
# fix (commit 7fcfacd) — the first r5 run's junk Ritz values are
# root-caused to the singular Gram matrix, not the solves.
cd "$(dirname "$0")/.."
set -u
while ! grep -q "QUEUE DONE" /tmp/r5b_queue.log 2>/dev/null; do sleep 60; done
R5_MAXIT=6 timeout 9000 python -u benchmarks/probe_r5_feast3b.py > /tmp/probe_r5_feast3b_fix.out 2>&1
echo "=== feast3b_fix exit=$? $(date +%T) ===" >> /tmp/r5b_queue.log
echo "FOLLOWUP DONE $(date +%T)" >> /tmp/r5b_queue.log
