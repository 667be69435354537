#!/usr/bin/env bash
# One-shot round-3 on-chip measurement sweep — run when the axon tunnel is
# healthy. Each stage retries once (transient tunnel HTTP failures happen
# ~once per long chain, benchmarks/NOTES.md).
#
#   bash benchmarks/round3_onchip.sh [LOGDIR]
#
# Stages:
#   1. grouped_pack_ab  — kernel-level A/B of the MXU-tile-packed per-group
#                         Grams (the round-3 change whose numbers NOTES.md
#                         lists as pending).
#   2. suite --grouped  — resnext50_32x4d / efficientnet_b0 end-to-end
#                         update+invert+eval (refreshes the README table row).
#   3. bench.py         — the headline JSON line.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/round3_onchip}"
mkdir -p "$LOG"

run() {  # run <name> <cmd...>
  local name="$1"; shift
  echo "=== $name ==="
  if ! timeout 1800 "$@" 2>&1 | tee "$LOG/$name.log"; then
    echo "--- $name failed; retrying once ---"
    sleep 30
    timeout 1800 "$@" 2>&1 | tee "$LOG/$name.retry.log"
  fi
}

run grouped_pack_ab python benchmarks/grouped_pack_ab.py
run suite_grouped   python benchmarks/suite.py --grouped
run bench           python bench.py
echo "logs in $LOG"
