#!/usr/bin/env bash
# Round-5 chip tail, swapped in after the perceptual A/B: the train-stage
# ledger (artifacts/r5_probes/train_*.log) showed the G forward/backward is
# 81% of the step (509 of 629 ms; VGG 65, GAN machinery 55), so the
# fast-train matrix runs BEFORE the remaining ablation arms — it is the
# round's main perf lever (VERDICT ask #3) and each probe is bounded,
# while the arms resume losslessly whenever the round ends.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5_probes

run () {
  local name=$1; shift
  echo "=== probe ${name}: $* ($(date -u +%H:%M:%S)) ==="
  ( timeout 2400 "$@" 2>&1 || echo "{\"metric\": \"${name}\", \"error\": \"rc=$?\"}" ) \
    | tee artifacts/r5_probes/${name}.log | tail -3
}

# fast-train matrix at the ledger's configuration (batch 2, block remat).
# Trimmed to the two decisive probes — tonight's relay compiles run
# 25-35 min each, and the ablation arms still need chip time (the b4 and
# vgg_bf16-solo variants are follow-ups, not decision-makers).
run train_fast          python tools/bench_train.py --batch 2 --remat --fast-train
run train_fast_vggbf16  python tools/bench_train.py --batch 2 --remat --fast-train --vgg-bf16

grep -h '"metric"' artifacts/r5_probes/train_fast*.log 2>/dev/null || true

# ablation closers, by evidential priority (each resumes losslessly)
QUALITY=23 bash tools/run_flagship_nosem.sh 2>&1 | tee artifacts/r5_probes/nosem_q23.log | tail -10
bash tools/run_r5_zerosem.sh 2>&1 | tee artifacts/r5_probes/zerosem.log | tail -10
bash tools/run_r5_semdown.sh 2>&1 | tee artifacts/r5_probes/semdown.log | tail -10
echo "=== r5 tail complete ($(date -u +%H:%M:%S)) ==="
