#!/bin/bash
# Round-4 session-4 TPU queue, stage 8: time-aware SERVING under the
# new batched voxel JVP/HVP kernels — MultiStream K=8 interleaved
# fd vs analytic-warm on the TA (Burgers T=10) fleet chain.  Waits for
# stage 7 (sequential TA A/B + bench sanity) to finish first.
set -u
cd /root/repo || exit 1
LOG=outputs/tpu_queue
mkdir -p "$LOG"

if [ -f /tmp/r4_queue7.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue7.pid)" 2>/dev/null; do sleep 60; done
fi
echo $$ > /tmp/r4_queue8.pid
trap 'rm -f /tmp/r4_queue8.pid' EXIT

run() {
  name=$1; shift
  echo "=== $name start $(date)" >> "$LOG/status.log"
  timeout 10800 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? $(date)" >> "$LOG/status.log"
}

run serving_ta_ab python tools/bench_serving.py 8 8 ab ta=1
echo "QUEUE8 DONE $(date)" >> "$LOG/status.log"
