#!/usr/bin/env bash
# Round-5 chip queue, scheduled FIRST this time (round-4 VERDICT weak #1:
# the probes were queued in the final hour and never ran). Strictly serial,
# each bounded. Order:
#   1. train-step stage ledger (full / no-VGG / no-GAN subtraction) — runs
#      first because it picks the training-throughput lever for item 3;
#   2. decode probes: session-paired s2d-e2e A/B at b24, the b32/b28 knee;
#   3. the perceptual-loss A/B (round-4 top ask — 3 trained arms; the
#      seg-VGG weights must already exist in artifacts/seg_vgg/).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5_probes

run () {
  local name=$1; shift
  echo "=== probe ${name}: $* ($(date -u +%H:%M:%S)) ==="
  ( timeout 2400 "$@" 2>&1 || echo "{\"metric\": \"${name}\", \"error\": \"rc=$?\"}" ) \
    | tee artifacts/r5_probes/${name}.log | tail -3
}

# 1. train-stage ledger at batch 2 (block remat, the default)
run train_full         python tools/bench_train.py --batch 2 --remat
run train_no_vgg       python tools/bench_train.py --batch 2 --remat --no-vgg
run train_no_gan       python tools/bench_train.py --batch 2 --remat --no-vgg --no-gan

# 2. decode probes — back-to-back in one chip session (the round-3 s2d-e2e
# comparison was cross-session; this re-pairs it minutes apart, warm cache)
run bench_b24_std      python bench.py
run bench_b24_s2de2e   env JPDSE_S2D_E2E=1 python bench.py
run bench_b32_s2de2e   env JPDSE_S2D_E2E=1 JPDSE_BENCH_BATCH=32 python bench.py
run bench_b32_std      env JPDSE_BENCH_BATCH=32 python bench.py
run bench_b28_s2de2e   env JPDSE_S2D_E2E=1 JPDSE_BENCH_BATCH=28 python bench.py

echo "=== probes complete ($(date -u +%H:%M:%S)) ==="
grep -h '"metric"' artifacts/r5_probes/*.log 2>/dev/null || true

# 3. perceptual-loss A/B (three arms; ~35 min each)
bash tools/run_perceptual_ab.sh 2>&1 | tee artifacts/r5_probes/perceptual_ab.log | tail -40

# 4. ablation closers (VERDICT ask #5): trained q15-point B-arm (q23), then
#    the architecture-symmetric zero_sem arm, then the cheap-semantics arm
#    (#6). Ordered by evidential priority; each resumes losslessly if the
#    round ends mid-run (phase machinery), so partial progress still lands.
QUALITY=23 bash tools/run_flagship_nosem.sh 2>&1 | tee artifacts/r5_probes/nosem_q23.log | tail -10
bash tools/run_r5_zerosem.sh 2>&1 | tee artifacts/r5_probes/zerosem.log | tail -10
bash tools/run_r5_semdown.sh 2>&1 | tee artifacts/r5_probes/semdown.log | tail -10
echo "=== r5 chip queue complete ($(date -u +%H:%M:%S)) ==="
