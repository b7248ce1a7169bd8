#!/bin/bash
# Waits for the round-5 probe queue to finish (one TPU client at a time),
# then runs the feast3b window-convergence probe.
cd "$(dirname "$0")/.."
set -u
while ! grep -q "QUEUE DONE" /tmp/r5_queue.log 2>/dev/null; do
  sleep 60
done
echo "=== probe_r5_feast3b start $(date +%T) ===" >> /tmp/r5_queue.log
timeout 9000 python -u benchmarks/probe_r5_feast3b.py \
  > /tmp/probe_r5_feast3b.out 2>&1
echo "=== probe_r5_feast3b exit=$? $(date +%T) ===" >> /tmp/r5_queue.log
