#!/bin/bash
# Run the train-step ablation stages sequentially, one process each
# (HBM isolation, honest per-program compiles).  G1 is cached from a prior
# run unless listed.  Usage: tools/run_train_ablation.sh [stages...]
set -u
cd "$(dirname "$0")/.."
STAGES="${@:-G3 G4 G5 G6}"
for s in $STAGES; do
  echo "=== stage $s $(date -u +%H:%M:%S) ==="
  timeout 1800 python tools/bench_train_ablation.py "$s" || echo "STAGE $s FAILED rc=$?"
done
cat .probe_train_ablation.json
