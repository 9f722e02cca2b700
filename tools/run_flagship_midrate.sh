#!/usr/bin/env bash
# Round-3 third trained operating point: the fully-learned flagship
# (binarized netE4label + netE -> GlobalGenerator, 1024x512/ngf64) at
# 64+64-bit bottlenecks — raw 0.5 bpp, between the 128+128 headline
# (raw 1.0) and the 32+32 low-rate point (raw 0.25). Three trained points
# make the R-D curve (BASELINE.md "Trained operating points").
#
# Warm start: restores the trained low-rate phaseB (or phaseA) checkpoint
# through the partial-restore path (train/checkpoint.py merge_trees) — the
# same cross-architecture restore the reference's base_model.py:62-97 does
# across phase changes; only the bottleneck-adjacent convs the width change
# touches re-init. Warm-started phases are shorter than the from-scratch
# recipe (the trunk is already trained).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
OUT=${OUT:-artifacts/flagship_r3_midrate}
WARM=${WARM:-artifacts/flagship_r3_lowrate/phaseB}
PA=${PA:-300}
PB=${PB:-250}
VAL_INT=${VAL_INT:-25}

BITS="--encoder_binarizer_out_channels 64 --label_encoder_binarizer_out_channels 64"

COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics --no_generator_binarization ${BITS} \
  --preprocess_mode fixed --load_size 1024 --crop_size 1024 \
  --val_preprocess_mode fixed --val_load_size 1024 --val_crop_size 1024 \
  --test_preprocess_mode fixed --test_load_size 1024 --test_crop_size 1024 \
  --batch_size 2 --num_workers 2 --seed 1234 --cache_images --remat \
  --val_interval ${VAL_INT} --max_recon_dump 2 --max_host_rss_gb 100 --latest_interval 100 \
  --normalize_mean .5,.5,.5 --normalize_std 1.,1.,1."

. "$(dirname "$0")/flagship_phase_lib.sh"

if [ ! -d "${WARM}/params" ]; then
  echo "ERROR: warm checkpoint ${WARM}/params not found" >&2
  exit 1
fi

echo "=== phase A: full objective at 64+64 bits, warm from ${WARM} (${PA} epochs) ==="
run_phase phaseA "${WARM}" "${PA}"

echo "=== phase B: distortion-only fine-tune (${PB} epochs) ==="
run_phase phaseB "${OUT}/phaseA" "${PB}" \
  --no_g_gan_loss --no_d_gan_loss --no_vgg_loss --no_gan_feat_loss \
  --schedule_lr --lr_decay_patience 3

echo "=== held-out eval + deploy round trip ==="
for ph in phaseA phaseB; do
  python test.py --load_opt --opt_file ${OUT}/${ph}/opt.json \
    --checkpoints_dir ${OUT}/${ph} --save_dir ${OUT}/eval_${ph} \
    --root_dir ${ROOT} --mode val
  python compress.py --load_opt --opt_file ${OUT}/${ph}/opt.json \
    --checkpoints_dir ${OUT}/${ph} --save_dir ${OUT}/bits_${ph} \
    --root_dir ${ROOT} --mode val
done
python decompress.py --input ${OUT}/bits_phaseB \
  --load_opt --opt_file ${OUT}/phaseB/opt.json \
  --checkpoints_dir ${OUT}/phaseB --save_dir ${OUT}/recon_phaseB

echo "=== flagship mid-rate training complete ==="
