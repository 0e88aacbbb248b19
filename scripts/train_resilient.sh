#!/bin/bash
# Restart-on-crash training wrapper. The remote TPU worker occasionally
# restarts (tunnel instability); train.py resume=auto picks up from the
# newest periodic checkpoint in the run dir.
# Usage: train_resilient.sh <max_restarts> <train.py args...>
set -u
MAX_RESTARTS=$1
shift
cd "$(dirname "$0")/.."
n=0
while true; do
  python train.py "$@" resume=auto
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[watchdog] training finished cleanly"
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
