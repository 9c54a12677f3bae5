#!/bin/bash
# Round-4 TPU queue, stage 5: gate the new analytic-coldfd mode (FD on
# cold frames, hybrid analytic on warm) against the shipped hybrid and
# the FD budgets at DSEC geometry.  The hybrid's only accuracy
# regressions (rot +4.4%, sparse +4.3% vs B) are cold-frame artifacts
# (round-4 rot CG study); coldfd should close them while keeping the
# analytic warm-frame wall.  gate_study.py 3 = 1 untimed cold window + 3 timed
# warm-chained windows per family (stats exclude the cold window).
set -u
cd /root/repo
mkdir -p outputs/gate
# publish our pid only AFTER waiting on the other stage (writing it
# first deadlocks if both stages launch together), and clean it up
# so a recycled pid can never stall a later stage

# relaunched after the finest-solver warm-flag fix; queue6 (MVSEC
# coldfd gate) took the chip in the meantime — wait for it
if [ -f /tmp/r4_queue6.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue6.pid)" 2>/dev/null; do sleep 30; done
fi
echo $$ > /tmp/r4_queue5.pid
trap 'rm -f /tmp/r4_queue5.pid' EXIT

echo "=== study 5: analytic-coldfd 6-family gate at DSEC geometry ==="
GATE_ARMS_JSON='{
  "B(fd)":              {"cg_maxiter": 8, "coarse_event_fraction": 0.25},
  "C(analytic)":        {"cg_maxiter": 8, "coarse_event_fraction": 0.25, "hvp_mode": "analytic"},
  "F(analytic-coldfd)": {"cg_maxiter": 8, "coarse_event_fraction": 0.25, "hvp_mode": "analytic-coldfd"}
}' python tools/gate_study.py 3 --geometry dsec \
    --out outputs/gate/coldfd_dsec.jsonl \
    > outputs/gate/coldfd_dsec.log 2>&1

echo "=== queue5 done ==="
