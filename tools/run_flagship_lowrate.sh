#!/usr/bin/env bash
# Round-3 second trained operating point: the same fully-learned flagship
# (binarized netE4label + netE -> GlobalGenerator, 1024x512/ngf64) at a
# QUARTER of the headline rate — 32+32-bit bottlenecks instead of 128+128
# (raw 0.25 bpp vs 1.0 before entropy coding). Turns the round-3 trained
# table from one rate point into an R-D curve.
#
# Two modes:
#  - Warm start (when ${WARM}/params exists): restore the trained 128-bit
#    phase-3 checkpoint through the partial-restore path
#    (train/checkpoint.py merge_trees) — every weight whose path+shape
#    still matches is kept, only the bottleneck-adjacent convs the width
#    change touches re-init (the same cross-architecture restore the
#    reference's base_model.py:62-97 does across phase changes). Then
#    phase A (full objective) + phase B (distortion-only).
#  - From scratch (no warm checkpoint, e.g. a fresh machine): the full
#    reference 3-phase recipe (pix2pixHD_bpg_train.sh structure) at the
#    32+32-bit widths: semantics-only, + binarized visuals full objective,
#    distortion-only fine-tune.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
OUT=${OUT:-artifacts/flagship_r3_lowrate}
WARM=${WARM:-artifacts/flagship_r3/phase3}
P1=${P1:-150}
PA=${PA:-600}
PB=${PB:-600}
VAL_INT=${VAL_INT:-25}

BITS="--encoder_binarizer_out_channels 32 --label_encoder_binarizer_out_channels 32"

COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics --no_generator_binarization ${BITS} \
  --preprocess_mode fixed --load_size 1024 --crop_size 1024 \
  --val_preprocess_mode fixed --val_load_size 1024 --val_crop_size 1024 \
  --test_preprocess_mode fixed --test_load_size 1024 --test_crop_size 1024 \
  --batch_size 2 --num_workers 2 --seed 1234 --cache_images --remat \
  --val_interval ${VAL_INT} --max_recon_dump 2 --max_host_rss_gb 100 --latest_interval 100"

STD2="--normalize_mean .5,.5,.5 --normalize_std 1.,1.,1."

. "$(dirname "$0")/flagship_phase_lib.sh"

if [ -d "${WARM}/params" ]; then
  echo "=== warm start from ${WARM}: phase A full objective (${PA} epochs) ==="
  PHASEA_PREV=${WARM}
else
  echo "=== no warm checkpoint; from-scratch phase 1: semantics-only (${P1} epochs) ==="
  run_phase phase1 "" "${P1}" --no_feat --no_distortion_loss
  PHASEA_PREV=${OUT}/phase1
fi

echo "=== phase A: full objective at 32+32 bits (${PA} epochs) ==="
run_phase phaseA "${PHASEA_PREV}" "${PA}" ${STD2}

echo "=== phase B: distortion-only fine-tune (${PB} epochs) ==="
run_phase phaseB "${OUT}/phaseA" "${PB}" ${STD2} \
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
