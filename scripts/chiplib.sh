#!/bin/bash
# Shared helpers for chip batch scripts (VERDICT r4 #1 + ADVICE r4).
# Source this; set LOGDIR before calling run helpers.
#
# Rules encoded here:
#   - EVERY chip-touching command runs under `flock /tmp/tpu.lock` with
#     CHIP_LOCK_HELD=1 exported so the child Python (utils/chiplock.py)
#     doesn't re-take the lock on a fresh fd and deadlock. Per-command
#     (per-arm) granularity: a concurrent script serializes at arm
#     boundaries instead of corrupting timings.
#   - A batch script registers its pid in /tmp/chip_batch.pid on entry and
#     removes it on exit; the watchdog refuses to relaunch while a
#     registered batch is alive (round-4's double-launch failure).
#   - wait_idle logs a LOUD marker when it gives up so a suspect timing is
#     distinguishable in the log (ADVICE r4).

TPU_LOCK=/tmp/tpu.lock
BATCH_PID_FILE=/tmp/chip_batch.pid

log() { echo "$@" | tee -a "$LOGDIR/summary.log"; }

register_batch() {
  if [ -f "$BATCH_PID_FILE" ] && kill -0 "$(cat "$BATCH_PID_FILE")" 2>/dev/null; then
    echo "another chip batch (pid $(cat "$BATCH_PID_FILE")) is alive — refusing to start" >&2
    exit 3
  fi
  echo $$ > "$BATCH_PID_FILE"
  trap 'rm -f "$BATCH_PID_FILE"' EXIT
}

wait_idle() {
  for i in $(seq 1 80); do
    [ -e /tmp/cpu_busy.lock ] || return 0
    log "waiting for cpu_busy.lock ($i)"
    sleep 30
  done
  log "WARNING: cpu_busy.lock still held after 40 min — proceeding; TIMINGS SUSPECT"
}

# probe_chip — 90 s matmul round trip under the lock. The tunnel can wedge
# BETWEEN a successful probe and the next dispatch (r4 batch 7b; r5 batch 1
# hard-blocked 25 min in jax init with 5 s of CPU), so every arm re-probes
# instead of trusting the launch-time probe.
probe_chip() {
  flock -w 600 "$TPU_LOCK" env CHIP_LOCK_HELD=1 timeout 90 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))
jax.block_until_ready(y); assert float(y) == 256.0**3
" >/dev/null 2>&1
}

# wait_chip [tries] — block until the chip answers (default 5 probes,
# ~2 min apart). On exhaustion ABORTS the whole batch (exit 4): the batch
# is idempotent and the watchdog relaunch loop retries it when the tunnel
# recovers — far cheaper than burning each arm's full timeout in sequence.
wait_chip() {
  local tries="${1:-5}"
  for i in $(seq 1 "$tries"); do
    probe_chip && return 0
    log "chip probe $i/$tries failed ($(date -u +%H:%M:%S)) — waiting 120s"
    sleep 120
  done
  log "ABORT: chip unreachable after $tries probes — batch exits for watchdog relaunch"
  exit 4
}

# chip_run <timeout_s> <cmd...>  — run one chip-touching command under the
# chip lock. Lock wait is generous (timeout + 2h) so queued arms survive a
# long holder; `timeout` bounds only the command itself.
chip_run() {
  local t="$1"; shift
  flock -w "$((t + 7200))" "$TPU_LOCK" \
    env CHIP_LOCK_HELD=1 timeout "$t" "$@"
}

# arm <name> <timeout_s> [ENV=V ...] -- <cmd...>  — a logged, locked,
# idle-waited arm writing stdout/stderr to $LOGDIR/<name>.{out,err}.
arm() {
  local name="$1" t="$2"; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if [ -e "$LOGDIR/$name.ok" ]; then
    log "=== $name already ok — skipping (relaunch resume)"
    return 0
  fi
  wait_idle
  wait_chip
  log "=== $name ($(date -u +%H:%M:%S)) ${envs[*]}"
  flock -w "$((t + 7200))" "$TPU_LOCK" \
    env CHIP_LOCK_HELD=1 "${envs[@]}" timeout "$t" "$@" \
    >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
  local rc=$?
  [ "$rc" -eq 0 ] && touch "$LOGDIR/$name.ok"
  { echo "rc=$rc"; tail -5 "$LOGDIR/$name.out"; } | tee -a "$LOGDIR/summary.log"
  return $rc
}
