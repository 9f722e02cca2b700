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

# q15-point row from the q20-trained no-sem decoder fed q23 payloads (the
# round-3 swap matrix showed PSNR transfers cross-q essentially for free);
# the per-q retrain below supersedes it when it completes
if [ -d artifacts/flagship_r4_nosem_q20/phaseB/params ]; then
  run python test.py --load_opt \
    --opt_file artifacts/flagship_r4_nosem_q20/phaseB/opt.json \
    --checkpoints_dir artifacts/flagship_r4_nosem_q20/phaseB \
    --save_dir artifacts/flagship_r4_nosem_q20/eval_phaseB_xq23 \
    --root_dir datasets/cityscapes_split --mode val --quality 23
fi

run env PA=${HIRES_PA:-60} PB=${HIRES_PB:-20} FIX_GLOBAL=20 \
  bash tools/run_flagship_hires.sh

run env QUALITY=23 PA=300 PB=100 bash tools/run_flagship_nosem.sh

if [ ! -f artifacts/seg_vgg/vgg19_seg.npz ]; then
  run python tools/train_seg_vgg.py --out artifacts/seg_vgg
fi

echo "=== chain complete ($(date -u +%H:%M:%S)) ==="
