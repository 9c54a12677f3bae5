#!/bin/bash
# Round-4 session-5 queue: MVSEC-geometry coarse_event_fraction study.
# The DSEC config adopted coarse 0.25 (5.8 -> 4.0 s/frame) in round 2;
# the MVSEC protocol config never measured it, and at MVSEC geometry
# the coarse scales dominate the wall (the reason the hybrid analytic
# HVP was a wash there).  Stage 1: clutter-scene interleaved A/B
# (speed + flowMAE).  Stage 2: the 6-family accuracy gate at MVSEC
# geometry (adoption evidence either way).
# Waits for the running hvp-ta 3-arm A/B first (shared TPU).
set -u
cd /root/repo || exit 1
LOG=outputs/tpu_queue
mkdir -p "$LOG"

if [ -f /tmp/r4_abta.pid ]; then
  while kill -0 "$(cat /tmp/r4_abta.pid)" 2>/dev/null; do sleep 60; done
fi
echo $$ > /tmp/r4_queue9.pid
trap 'rm -f /tmp/r4_queue9.pid' EXIT

run() {
  name=$1; shift
  echo "=== $name start $(date)" >> "$LOG/status.log"
  timeout 10800 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? $(date)" >> "$LOG/status.log"
}

run ab_coarse_mvsec python tools/ab_policy.py 4 coarse

export GATE_ARMS_JSON='{"A(mvsec-default)": {}, "B(coarse 0.25)": {"coarse_event_fraction": 0.25}}'
run gate_coarse_mvsec python tools/gate_study.py --geometry mvsec \
    --out outputs/gate/coarse_mvsec.jsonl quadrants disc rot zoom noise sparse 3
unset GATE_ARMS_JSON
echo "QUEUE9 DONE $(date)" >> "$LOG/status.log"
