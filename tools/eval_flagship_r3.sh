#!/usr/bin/env bash
# Held-out evaluation of the round-3 flagship run (after/while
# tools/run_flagship_round3.sh): reference-protocol metrics + real
# entropy-coded rate on the 8 held-out images, .jpds deploy round trip,
# and the base-codec-alone R-D line on the same images.
# Usage: tools/eval_flagship_r3.sh [phase2|phase3] (default phase3)
set -euo pipefail
cd "$(dirname "$0")/.."

PH=${1:-phase3}
OUT=artifacts/flagship_r3

# 1) reference eval protocol on the held-out 8 (rate + distortion + galleries)
python test.py --load_opt --opt_file ${OUT}/${PH}/opt.json \
  --checkpoints_dir ${OUT}/${PH} --save_dir ${OUT}/eval_${PH} \
  --root_dir datasets/cityscapes_split --mode val

# 2) deploy bitstreams: real .jpds files + round-trip reconstructions
python compress.py --load_opt --opt_file ${OUT}/${PH}/opt.json \
  --checkpoints_dir ${OUT}/${PH} --save_dir ${OUT}/bits_${PH} \
  --root_dir datasets/cityscapes_split --mode val
python decompress.py --input ${OUT}/bits_${PH} \
  --load_opt --opt_file ${OUT}/${PH}/opt.json \
  --checkpoints_dir ${OUT}/${PH} --save_dir ${OUT}/recon_${PH}

# 3) the base codec alone on the same held-out images (comparison line)
if [ ! -f ${OUT}/base_codec_rd.json ]; then
  JAX_PLATFORMS=cpu python tools/base_codec_rd.py \
    --root datasets/cityscapes_split --mode val --ext heif \
    --qualities 15,20,30,40,50,60,70 --out ${OUT}/base_codec_rd.json
fi

echo "=== held-out metrics (${PH}) ==="
cat ${OUT}/eval_${PH}/metrics.json
