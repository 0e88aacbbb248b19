#!/bin/bash
# Snapshot a training run's evidence into the committed tree.
#
# runs/ is gitignored (checkpoints every 100 iters get large); round 1's
# training evidence was lost with the worker filesystem because nothing
# was committed. This copies the durable artifacts of one run —
# metrics.jsonl, the latest periodic checkpoint, and the best checkpoint —
# into docs/evidence/<run>/ so `git add docs/evidence` preserves them.
#
# Usage: snapshot_evidence.sh <run-name> [<run-name> ...]
set -eu
cd "$(dirname "$0")/.."
for run in "$@"; do
  src="runs/$run"
  dst="docs/evidence/$run"
  [ -d "$src" ] || { echo "no such run: $src" >&2; exit 1; }
  mkdir -p "$dst"
  cp "$src/metrics.jsonl" "$dst/" 2>/dev/null || true
  if [ -d "$src/nn" ]; then
    latest=$(ls "$src/nn" | grep -E '^ckpt_[0-9]+\.npz$' \
      | sort -t_ -k2 -n | tail -1 || true)
    if [ -n "${latest:-}" ]; then
      cp "$src/nn/$latest" "$dst/"
      # .tree sidecar separately: a missing sidecar must not abort the
      # whole snapshot under set -eu
      [ -f "$src/nn/$latest.tree" ] && cp "$src/nn/$latest.tree" "$dst/" || true
    fi
    for b in best_0.npz best_0.npz.tree; do
      [ -f "$src/nn/$b" ] && cp "$src/nn/$b" "$dst/" || true
    done
  fi
  echo "snapshotted $src -> $dst:"
  ls -l "$dst"
done
