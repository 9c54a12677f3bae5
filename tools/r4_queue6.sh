#!/bin/bash
# Round-4 TPU queue, stage 6: analytic-coldfd at MVSEC protocol
# geometry.  The MVSEC warm gate's B(hybrid) arm ran the hybrid on ALL
# frames; if its +0.5-1% EPE cost is (like rot at DSEC) a cold-frame
# artifact, coldfd should reach central-FD parity while keeping the
# hybrid's warm wall — which would let the MVSEC eval config itself
# adopt it.  4 windows (1 cold + 3 warm) per family.
set -u
echo $$ > /tmp/r4_queue6.pid  # the next stage gates on this pid
cd /root/repo
mkdir -p outputs/gate

if [ -f /tmp/r4_queue5.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue5.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== study 6: analytic-coldfd 6-family gate at MVSEC geometry ==="
GATE_ARMS_JSON='{
  "A(central-fd)":      {},
  "F(analytic-coldfd)": {"hvp_mode": "analytic-coldfd"}
}' python tools/gate_study.py 4 --geometry mvsec \
    --out outputs/gate/coldfd_mvsec.jsonl \
    > outputs/gate/coldfd_mvsec.log 2>&1

echo "=== queue6 done ==="
