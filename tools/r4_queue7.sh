#!/bin/bash
# Round-4 session-4 TPU queue: the time-aware voxel analytic HVP
# (landed 6dd648a, CPU-tested) needs its hardware decision, and the
# global-model analytic enablement (7e25f28) already has CLI parity —
# this queue measures the TA solve-level A/B plus a bench sanity
# capture the moment the tunneled TPU answers again.
#
#     nohup bash tools/r4_queue7.sh > /dev/null 2>&1 &
#
# Results land in outputs/tpu_queue/ (status.log for progress).
set -u
cd /root/repo || exit 1
LOG=outputs/tpu_queue
mkdir -p "$LOG"
echo $$ > /tmp/r4_queue7.pid
trap 'rm -f /tmp/r4_queue7.pid' EXIT

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
  timeout 7200 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? $(date)" >> "$LOG/status.log"
}

# TA voxel analytic HVP: solve-level interleaved A/B (speed + flowMAE)
run ab_hvp_ta   python tools/ab_policy.py 3 hvp-ta
# TA e2e s/frame under each mode (the BENCHMARKS TA row is ~2.0 s/frame)
run ta_fd       python tools/bench_e2e.py ta
run ta_analytic python tools/bench_e2e.py ta hvp_mode=analytic
# bench sanity (kernel north star should hold ~670 Mev/s)
run bench       python bench.py
echo "QUEUE7 DONE $(date)" >> "$LOG/status.log"
