#!/bin/bash
# Waits for the round-5 probe queue to finish (one TPU client at a time),
# then runs the follow-up probes: feast3b (nP=123 window with n_trial=8 /
# n_quad=16) and the feast57 retry with ls_restart=120 (the first leg ran
# the default restart 20 and stalled on the near-axis nodes).
cd "$(dirname "$0")/.."
set -u
while ! grep -q "QUEUE DONE" /tmp/r5_queue.log 2>/dev/null; do
  sleep 60
done
for p in probe_r5_feast3b probe_r5_feast57; do
  echo "=== $p start $(date +%T) ===" >> /tmp/r5_queue.log
  timeout 9000 python -u "benchmarks/$p.py" > "/tmp/$p.out" 2>&1
  echo "=== $p exit=$? $(date +%T) ===" >> /tmp/r5_queue.log
done
echo "FOLLOWUPS DONE $(date +%T)" >> /tmp/r5_queue.log
