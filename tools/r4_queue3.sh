#!/bin/bash
# Round-4 TPU queue, stage 3: analytic-warm at DSEC geometry.
# The rot CG confirmation showed the hybrid's warm frames already match
# FD at DSEC geometry (the gap is cold-frame only); analytic-warm runs
# warm frames full-analytic (FD/hybrid only on the cold first frame),
# which should cut the steady DSEC wall further.  Gate: shipped
# C(analytic) vs W(analytic-warm), all 6 families, 3 windows (2 warm).
set -u
echo $$ > /tmp/r4_queue3.pid  # the next stage gates on this pid
cd /root/repo
mkdir -p outputs/gate

if [ -f /tmp/r4_queue2.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue2.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== study 3: analytic-warm 6-family gate at DSEC geometry ==="
GATE_ARMS_JSON='{
  "C(analytic)":      {"cg_maxiter": 8, "coarse_event_fraction": 0.25, "hvp_mode": "analytic"},
  "W(analytic-warm)": {"cg_maxiter": 8, "coarse_event_fraction": 0.25, "hvp_mode": "analytic-warm"}
}' python tools/gate_study.py 3 --geometry dsec \
    --out outputs/gate/warm_dsec.jsonl \
    > outputs/gate/warm_dsec.log 2>&1

echo "=== queue3 done ==="
