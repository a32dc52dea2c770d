#!/usr/bin/env bash
# Snapshot the text artifacts (logs + specs, not weights) of results/<name>/
# into the tracked artifacts/<name>/ dir so on-chip run evidence survives
# environment resets. Usage: tools/snapshot_artifacts.sh <name> [suffix]
set -euo pipefail
name="$1"
suffix="${2:-}"
src="results/$name"
dst="artifacts/$name"
[ -d "$src" ] || { echo "no $src" >&2; exit 1; }
mkdir -p "$dst"
for f in specs.json train_losses.log test_losses.log metrics.log; do
  if [ -f "$src/$f" ]; then
    cp "$src/$f" "$dst/${f%.*}${suffix:+.$suffix}.${f##*.}"
  fi
done
ls -la "$dst"
