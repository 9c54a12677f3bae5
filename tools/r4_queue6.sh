#!/bin/bash
# Round-4 TPU queue, stage 6: analytic-coldfd at MVSEC protocol
# geometry.  The MVSEC warm gate's B(hybrid) arm ran the hybrid on ALL
# frames; if its +0.5-1% EPE cost is (like rot at DSEC) a cold-frame
# artifact, coldfd should reach central-FD parity while keeping the
# hybrid's warm wall — which would let the MVSEC eval config itself
# adopt it.  gate_study.py 4 = 1 untimed cold window + 4 timed
# warm-chained windows per family (stats exclude the cold window).
set -u
cd /root/repo
mkdir -p outputs/gate
# publish our pid only AFTER waiting on the other stage (writing it
# first deadlocks if both stages launch together), and clean it up
# so a recycled pid can never stall a later stage

if [ -f /tmp/r4_queue5.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue5.pid)" 2>/dev/null; do sleep 30; done
fi
echo $$ > /tmp/r4_queue6.pid
trap 'rm -f /tmp/r4_queue6.pid' EXIT

echo "=== study 6: analytic-coldfd 6-family gate at MVSEC geometry ==="
GATE_ARMS_JSON='{
  "A(central-fd)":      {},
  "F(analytic-coldfd)": {"hvp_mode": "analytic-coldfd"}
}' python tools/gate_study.py 4 --geometry mvsec \
    --out outputs/gate/coldfd_mvsec.jsonl \
    > outputs/gate/coldfd_mvsec.log 2>&1

echo "=== queue6 done ==="
