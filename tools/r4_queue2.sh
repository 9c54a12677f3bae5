#!/bin/bash
# Round-4 TPU queue, stage 2: serving re-bench under the v10 analytic
# modes (VERDICT r3 task #1 second half — the r3 serving numbers predate
# v10 and are stale upper bounds).  Waits for stage 1 (gate studies).
set -u
echo $$ > /tmp/r4_queue2.pid  # the next stage gates on this pid
cd /root/repo
mkdir -p outputs/gate

if [ -f /tmp/r4_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== serving bench: multistream fd vs analytic-warm (interleaved in ONE process) ==="
python tools/bench_serving.py 12 8 ab \
    > outputs/gate/serving_multi_ab.log 2>&1

echo "=== serving bench: http (per-mode; pushes are ~1s so process drift is visible — compare medians over 12) ==="
python tools/bench_serving.py 12 8 http hvp_mode=fd \
    > outputs/gate/serving_http_fd.log 2>&1
python tools/bench_serving.py 12 8 http hvp_mode=analytic-warm \
    > outputs/gate/serving_http_warm.log 2>&1

echo "=== queue2 done ==="
