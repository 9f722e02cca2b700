#!/usr/bin/env bash
# Round-4 chip perf probes (VERDICT items 4, 7, 9) — short, strictly
# serial, each bounded. Run in a chip gap; results land as JSON lines in
# artifacts/r4_probes/ for the PERF.md tables.
#
#  - train-step stage ledger (item 4): full / no-VGG / no-GAN variants of
#    the flagship GAN step; subtraction attributes VGGx2, D-machinery, and
#    the G+optimizer remainder.
#  - s2d-e2e session-paired A/B at batch 24 (item 9): the round-3
#    comparison was cross-session; this re-pairs it.
#  - decode batch-32 probe (item 7): does the s2d-e2e assembly (no
#    fine-domain one-hot/concat materialization) fit where the standard
#    assembly OOMs at 18.9G/15.75G? Plus b28 under e2e.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4_probes

run () {
  local name=$1; shift
  echo "=== probe ${name}: $* ($(date -u +%H:%M:%S)) ==="
  ( timeout 2400 "$@" 2>&1 || echo "{\"metric\": \"${name}\", \"error\": \"rc=$?\"}" ) \
    | tee artifacts/r4_probes/${name}.log | tail -3
}

# item 9 + item 7 — decode probes (each bench.py call compiles ~5-15 min)
run bench_b24_std      python bench.py
run bench_b24_s2de2e   env JPDSE_S2D_E2E=1 python bench.py
run bench_b32_s2de2e   env JPDSE_S2D_E2E=1 JPDSE_BENCH_BATCH=32 python bench.py
run bench_b32_std      env JPDSE_BENCH_BATCH=32 python bench.py
run bench_b28_s2de2e   env JPDSE_S2D_E2E=1 JPDSE_BENCH_BATCH=28 python bench.py

# item 4 — train-step stage ledger at batch 2 (block remat, the default)
run train_full         python tools/bench_train.py --batch 2 --remat
run train_no_vgg       python tools/bench_train.py --batch 2 --remat --no-vgg
run train_no_gan       python tools/bench_train.py --batch 2 --remat --no-vgg --no-gan

# item 2 support — the 2048x1024 LocalEnhancer decode row
run bench_local_2048   python tools/bench_local.py

echo "=== probes complete ==="
grep -h '"metric"' artifacts/r4_probes/*.log 2>/dev/null || true
