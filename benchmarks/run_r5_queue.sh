#!/bin/bash
# Round-5 TPU probe queue — strictly sequential (one TPU client at a time;
# a killed grant wedges the axon relay for ~15 min, so never interrupt).
# Each probe logs to /tmp/<name>.out; queue log to /tmp/r5_queue.log.
#
# Resumed 2026-08-20: feast3 (3-lane) crashed the worker at 07:47; rt123
# was killed at step 29/50 by a session restart.  Remaining order: the
# proven rt123 first (full 50 steps), then the single-lane feast3 retry,
# then the three timing rows.
cd "$(dirname "$0")/.."
set -u
for p in probe_r4_rt123 probe_r4_feast3 probe_r4_ccsd219 probe_r5_feast57 \
         probe_r5_ccsd389; do
  echo "=== $p start $(date +%T) ===" >> /tmp/r5_queue.log
  timeout 5400 python -u "benchmarks/$p.py" > "/tmp/$p.out" 2>&1
  echo "=== $p exit=$? $(date +%T) ===" >> /tmp/r5_queue.log
done
echo "QUEUE DONE $(date +%T)" >> /tmp/r5_queue.log
