#!/bin/bash
# Round-4 TPU study queue (VERDICT r3 tasks #1-3).  Runs after the
# in-flight gate_dsec run releases the chip; each study is a gate_study
# invocation with per-family subprocess isolation + JSONL resume, so a
# mid-run tunnel crash costs one family, not the queue.
set -u
echo $$ > /tmp/r4_queue.pid  # the next stage gates on this pid
cd /root/repo
mkdir -p outputs/gate

# wait for the current gate run to finish (it holds the chip)
if [ -f /tmp/gate_dsec.pid ]; then
  while kill -0 "$(cat /tmp/gate_dsec.pid)" 2>/dev/null; do sleep 20; done
fi

echo "=== study 1: rot CG-budget confirmation (task #3) ==="
GATE_ARMS_JSON='{
  "B(fd cg8)":        {"cg_maxiter": 8,  "coarse_event_fraction": 0.25},
  "C(analytic cg8)":  {"cg_maxiter": 8,  "coarse_event_fraction": 0.25, "hvp_mode": "analytic"},
  "D(analytic cg12)": {"cg_maxiter": 12, "coarse_event_fraction": 0.25, "hvp_mode": "analytic"},
  "E(analytic cg16)": {"cg_maxiter": 16, "coarse_event_fraction": 0.25, "hvp_mode": "analytic"}
}' python tools/gate_study.py rot 3 --geometry dsec \
    --out outputs/gate/rot_cg_confirm.jsonl \
    > outputs/gate/rot_cg_confirm.log 2>&1

echo "=== study 2: analytic-warm 6-family gate at MVSEC geometry (task #1) ==="
GATE_ARMS_JSON='{
  "A(central-fd)":   {},
  "B(hybrid)":       {"hvp_mode": "analytic"},
  "C(analytic-warm)": {"hvp_mode": "analytic-warm"}
}' python tools/gate_study.py 4 --geometry mvsec \
    --out outputs/gate/warm_mvsec.jsonl \
    > outputs/gate/warm_mvsec.log 2>&1

echo "=== queue done ==="
