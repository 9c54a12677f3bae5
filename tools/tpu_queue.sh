#!/bin/bash
# TPU-outage measurement queue (round-2 session 3/4).
#
# The tunneled TPU can be down for hours (device init hangs after the
# "Platform 'axon' is experimental" warning).  This script polls for the
# device with a bounded timeout and, the moment it answers, runs the
# queued calibrated probes / solve-level A/Bs sequentially, logging to
# outputs/tpu_queue/.  Run inside tmux so it survives the session:
#
#     tmux new-session -d -s tpuq 'bash tools/tpu_queue.sh'
#
# Queued decisions (see BENCHMARKS.md "Session 3" table):
#   - v8 tent kernel build: probe flex1280 vs tentflex1280 (vote shape),
#     tentflex objective shape, tent solve A/B
#   - coarse Newton budgets: budget-dsec A/B
#   - device L-BFGS: lbfgs-dsec A/B
#   - bench.py capture (>=500 Mev/s check)
cd /root/repo || exit 1
LOG=outputs/tpu_queue
mkdir -p "$LOG"

echo "watcher start $(date)" >> "$LOG/status.log"
while true; do
  if timeout 300 python -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
import jax.numpy as jnp
import numpy as np
x = jnp.asarray(np.random.default_rng(int(__import__('time').time())).normal(size=(8, 128)), jnp.float32)
print('alive', float((x @ x.T).sum()), d)
" >> "$LOG/ping.log" 2>&1; then
    echo "TPU UP $(date)" >> "$LOG/status.log"
    break
  fi
  echo "tpu down $(date)" >> "$LOG/status.log"
  sleep 300
done

run() {
  name=$1; shift
  echo "=== $name start $(date)" >> "$LOG/status.log"
  timeout 5400 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? $(date)" >> "$LOG/status.log"
}

run probe_vote      python tools/probe_kernel.py flex1280:96 tentflex1280:96
run probe_obj_mvsec python tools/probe_objective.py mvsec flex1024:96 tentflex1024:96 tentallflex1024:96
run probe_obj_dsec  python tools/probe_objective.py dsec flex1024:96 tentflex1024:96 tentallflex1024:96
run ab_tent         python tools/ab_policy.py 3 tent
run ab_budget_dsec  python tools/ab_policy.py 3 budget-dsec
run ab_lbfgs_dsec   python tools/ab_policy.py 3 lbfgs-dsec
run bench           python bench.py
echo "QUEUE DONE $(date)" >> "$LOG/status.log"
