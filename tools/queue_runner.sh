#!/bin/bash
# Consolidated TPU measurement queue runner (VERDICT r4 task #8 — replaces
# the per-session r4_queue[1-9].sh copy-paste).
#
#     nohup bash tools/queue_runner.sh tools/round5.queue &
#
# Queue file format — one task per line:
#
#     NAME :: TIMEOUT_S :: SHELL_COMMAND
#
# Blank lines and #-comments are skipped.  The command runs under
# `bash -c` from the repo root, so env-var prefixes (GATE_ARMS_JSON=...)
# work inline.  Semantics (inherited from tpu_queue.sh / r4_queue*.sh):
#
#   - waits for the tunneled TPU to answer before the first task unless
#     NOTPU=1 (device init can hang for hours during tunnel outages);
#     re-pings between tasks and re-waits if the tunnel dropped
#   - waits on a pid file first when QUEUE_WAIT_PIDFILE is set (chip
#     hand-off from an in-flight run)
#   - one log per task in outputs/tpu_queue/NAME.log, timeline in
#     outputs/tpu_queue/status.log
#   - resume: a task whose done-marker (outputs/tpu_queue/done/NAME.done)
#     records exit=0 is skipped on re-run; delete the marker to force
#   - writes its own pid to /tmp/queue_runner.pid (never kill by pattern)
set -u
cd /root/repo || exit 1
QUEUE_FILE=${1:?usage: queue_runner.sh QUEUE_FILE}
LOG=outputs/tpu_queue
DONE="$LOG/done"
mkdir -p "$LOG" "$DONE"
echo $$ > /tmp/queue_runner.pid

status() { echo "$* $(date '+%F %T')" >> "$LOG/status.log"; }

ping_tpu() {
  timeout 300 python - >> "$LOG/ping.log" 2>&1 <<'EOF'
import time
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import numpy as np
import jax.numpy as jnp
x = jnp.asarray(np.random.default_rng(int(time.time())).normal(size=(8, 128)), jnp.float32)
print("alive", float((x @ x.T).sum()), d, flush=True)
# the tunneled PJRT client can hang at interpreter teardown AFTER the
# device answered — a hung exit must not read as "tpu down"
import os
os._exit(0)
EOF
}

wait_tpu() {
  [ "${NOTPU:-0}" = "1" ] && return 0
  until ping_tpu; do
    status "tpu down"
    sleep 300
  done
  status "TPU UP"
}

if [ -n "${QUEUE_WAIT_PIDFILE:-}" ] && [ -f "$QUEUE_WAIT_PIDFILE" ]; then
  status "waiting on pidfile $QUEUE_WAIT_PIDFILE"
  while kill -0 "$(cat "$QUEUE_WAIT_PIDFILE")" 2>/dev/null; do sleep 30; done
fi

status "queue start ($QUEUE_FILE)"
wait_tpu

while IFS= read -r line || [ -n "$line" ]; do
  case "$line" in ''|'#'*) continue;; esac
  name=$(echo "$line" | awk -F' :: ' '{print $1}' | xargs)
  tmo=$(echo "$line"  | awk -F' :: ' '{print $2}' | xargs)
  cmd=$(echo "$line"  | awk -F' :: ' '{st=index($0," :: "); rest=substr($0,st+4); st2=index(rest," :: "); print substr(rest,st2+4)}')
  if [ -z "$name" ] || [ -z "$tmo" ] || [ -z "$cmd" ]; then
    status "SKIP malformed line: $line"
    continue
  fi
  if grep -q 'exit=0' "$DONE/$name.done" 2>/dev/null; then
    status "skip $name (done)"
    continue
  fi
  # Do NOT re-ping between tasks: the tunnel serializes clients and a
  # redundant liveness probe can hang and eat the up-window the task
  # needed (observed 11:10 UTC day 1).  Re-wait only after a failure.
  if [ "${NEED_WAIT:-0}" = "1" ]; then
    wait_tpu
    NEED_WAIT=0
  fi
  status "=== $name start"
  timeout "$tmo" bash -c "$cmd" < /dev/null > "$LOG/$name.log" 2>&1
  rc=$?
  echo "exit=$rc $(date '+%F %T')" > "$DONE/$name.done"
  status "=== $name exit=$rc"
  [ "$rc" -ne 0 ] && NEED_WAIT=1
done < "$QUEUE_FILE"

status "QUEUE DONE ($QUEUE_FILE)"
rm -f /tmp/queue_runner.pid
