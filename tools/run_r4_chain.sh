#!/usr/bin/env bash
# Round-4 chip queue, run after the q30 replay restores the warm-start
# chain (artifacts/flagship_r3_compressed_long/phaseB). Strictly serial —
# one chip — in VERDICT priority order:
#   1. matched-rate no-semantics ablation at the q10 point (base q20)
#   2. matched-rate no-semantics ablation at the q15 point (base q23)
#   3. the in-environment seg-VGG feature net (minutes; perceptual-loss #3)
#   4. the 2048x1024 LocalEnhancer hires flagship (shortened schedule)
# Each stage is independently resumable (phase-lib checkpoint semantics);
# rerunning this script skips completed stages.
set -uo pipefail
cd "$(dirname "$0")/.."

run () {
  echo "=== chain: $* ($(date -u +%H:%M:%S)) ==="
  "$@" || echo "=== chain stage FAILED (rc=$?): $* — continuing ==="
}

run env QUALITY=20 PA=300 PB=100 bash tools/run_flagship_nosem.sh
run env QUALITY=23 PA=300 PB=100 bash tools/run_flagship_nosem.sh

if [ ! -f artifacts/seg_vgg/vgg19_seg.npz ]; then
  run python tools/train_seg_vgg.py --out artifacts/seg_vgg
fi

run env PA=${HIRES_PA:-100} PB=${HIRES_PB:-30} FIX_GLOBAL=25 \
  bash tools/run_flagship_hires.sh

echo "=== chain complete ($(date -u +%H:%M:%S)) ==="
