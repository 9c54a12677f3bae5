#!/bin/bash
# Round-4 TPU queue, stage 4: redo the HTTP serving benches (the
# analytic-warm arm died on a 600 s client timeout mid-first-compile;
# bench_serving now uses a 3600 s timeout for the compile pushes and
# excludes both compile pushes from the latency sample).
set -u
echo $$ > /tmp/r4_queue4.pid  # the next stage gates on this pid
cd /root/repo
mkdir -p outputs/gate

if [ -f /tmp/r4_queue3.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue3.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== http bench redo: fd then analytic-warm (sequential; compare medians) ==="
python tools/bench_serving.py 12 8 http hvp_mode=fd \
    > outputs/gate/serving_http_fd2.log 2>&1
python tools/bench_serving.py 12 8 http hvp_mode=analytic-warm \
    > outputs/gate/serving_http_warm2.log 2>&1

echo "=== queue4 done ==="
