#!/bin/bash
# Restart-on-crash/hang training wrapper. The remote TPU worker can crash
# (process exits) or stall (device call never returns); train.py
# resume=auto picks up from the newest periodic checkpoint either way.
# Usage: train_resilient.sh <max_restarts> <train.py args...>
set -u
MAX_RESTARTS=$1
shift
cd "$(dirname "$0")/.."
STALL_SECS=${STALL_SECS:-420}
# a FRESH compile of a fleet-scale env (multiobj C~372) takes 8-10 min
# with a cold jit cache — the stall monitor must not kill it mid-compile
# (it did: rc=137 restart loops whose only symptom was silence).
# r5 measurement: the full restart pipeline (genesis pool rebuild +
# compile + first 10-iter log line) takes 13-15 min even with a warm
# cache, and the remote worker wedges if a new client attaches within
# ~60s of a killed one — 900s killed two HEALTHY restarts in a row
# (multiobj_r5a, 22:18/22:34). 1800s covers the measured pipeline 2x.
STARTUP_GRACE=${STARTUP_GRACE:-1800}
n=0
while true; do
  python train.py "$@" resume=auto &
  pid=$!
  start=$(date +%s)
  # stall monitor: kill the trainer if it stops producing output
  (
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      last=$(date -r /proc/$pid/fd/1 +%s 2>/dev/null || echo 0)
      now=$(date +%s)
      limit=$STALL_SECS
      if [ $((now - start)) -lt "$STARTUP_GRACE" ]; then
        limit=$STARTUP_GRACE
      fi
      if [ "$last" -gt 0 ] && [ $((now - last)) -gt "$limit" ]; then
        echo "[watchdog] trainer $pid stalled >${limit}s; killing"
        kill -9 "$pid" 2>/dev/null
        break
      fi
    done
  ) &
  mon=$!
  wait "$pid"
  rc=$?
  kill "$mon" 2>/dev/null
  if [ $rc -eq 0 ]; then
    echo "[watchdog] training finished cleanly"
    # auto-snapshot evidence: a finished run must not be able to miss its
    # docs/evidence/ copy (r4 ended with a red test_evidence because three
    # runs were never snapshotted by hand)
    exp=$(printf '%s\n' "$@" | sed -n 's/^experiment=//p' | tail -1)
    if [ -n "${exp:-}" ] && [ -d "runs/$exp" ]; then
      bash scripts/snapshot_evidence.sh "$exp" || true
    fi
    exit 0
  fi
  n=$((n + 1))
  if [ $n -gt "$MAX_RESTARTS" ]; then
    echo "[watchdog] giving up after $n restarts (rc=$rc)"
    exit $rc
  fi
  echo "[watchdog] train.py exited rc=$rc; restart $n/$MAX_RESTARTS in 60s"
  sleep 60
done
