#!/usr/bin/env bash
# Round-3 second trained operating point: the same fully-learned flagship
# (binarized netE4label + netE -> GlobalGenerator, 1024x512/ngf64) at a
# QUARTER of the headline rate — 32+32-bit bottlenecks instead of 128+128
# (raw 0.25 bpp vs 1.0 before entropy coding). Turns the round-3 trained
# table from one rate point into an R-D curve.
#
# Warm start: the trained 128-bit phase-3 checkpoint
# (artifacts/flagship_r3/phase3). The partial-restore path
# (train/checkpoint.py merge_trees) keeps every weight whose path+shape
# still matches and re-inits only the bottleneck-adjacent convs the width
# change touches — the same cross-architecture restore the reference's
# base_model.py:62-97 does across phase changes.
#
# Phase A: full GAN+VGG+featmatch+distortion objective at the new width
# Phase B: distortion-only fine-tune, plateau-LR (the PSNR phase)
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
OUT=${OUT:-artifacts/flagship_r3_lowrate}
WARM=${WARM:-artifacts/flagship_r3/phase3}
PA=${PA:-500}
PB=${PB:-500}
VAL_INT=${VAL_INT:-25}

BITS="--encoder_binarizer_out_channels 32 --label_encoder_binarizer_out_channels 32"

COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics --no_generator_binarization ${BITS} \
  --preprocess_mode fixed --load_size 1024 --crop_size 1024 \
  --val_preprocess_mode fixed --val_load_size 1024 --val_crop_size 1024 \
  --test_preprocess_mode fixed --test_load_size 1024 --test_crop_size 1024 \
  --batch_size 2 --num_workers 2 --seed 1234 --cache_images --remat \
  --val_interval ${VAL_INT} --max_recon_dump 2 \
  --normalize_mean .5,.5,.5 --normalize_std 1.,1.,1."

run_phase () {
  local name=$1 prev=$2 epochs=$3; shift 3
  local dir=${OUT}/${name}
  mkdir -p "${dir}"
  local load=""
  if [ -n "${prev}" ]; then load="--load_model --checkpoints_dir ${prev}"; fi
  # bootstrap epoch (always_save) unless resuming this phase
  if [ ! -d "${dir}/params" ]; then
    python train.py ${COMMON} "$@" ${load} \
      --save_dir "${dir}" --num_epochs 1 --always_save --val_interval 1
  fi
  python train.py ${COMMON} "$@" \
    --load_model --checkpoints_dir "${dir}" \
    --save_dir "${dir}" --num_epochs "${epochs}"
}

echo "=== phase A: full objective at 32+32 bits, warm-started (${PA} epochs) ==="
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

echo "=== flagship low-rate training complete ==="
