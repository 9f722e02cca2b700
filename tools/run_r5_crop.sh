#!/usr/bin/env bash
# Round-5 crop-based training arm (round-4 VERDICT ask #7): the stated
# reason the paper's claim can't transfer here is the 22-image training
# set — and training at a fixed 1024x512 downsample throws away 3/4 of the
# native 2048x1024 supervision. This arm trains the q15 compressed-visuals
# flagship on RANDOM 1024x1024 square crops of the full-resolution
# originals (the reference's own preprocess machinery,
# ctu/data/base_dataset.py:29-49 -> data/transforms.py, key-threaded), with
# val/test kept at the standard fixed 1024x512 so the held-out rows compare
# directly to every other arm.
#
# Notes: random preprocessing is incompatible with the device cache
# (--cache_images off), so the run leans on --max_host_rss_gb + the phase
# lib's restart loop for the relay client's upload leak; 1024x1024 crops
# are 2x the pixels of the fixed recipe -> batch 1 with block remat.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
QUALITY=${QUALITY:-15}
OUT=${OUT:-artifacts/r5_crop_q${QUALITY}}
WARM=${WARM:-artifacts/flagship_r3_compressed_long/phaseB}
PA=${PA:-150}
PB=${PB:-50}
VAL_INT=${VAL_INT:-25}

CFG="--use_compressed --ext heif --quality ${QUALITY} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization"

# batch 1 at 1024x1024: 22 steps/epoch (export for the stall guard's
# progress heuristic in flagship_phase_lib.sh)
export LINES_PER_EPOCH=22

COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics ${CFG} \
  --preprocess_mode crop --load_size 2048 --crop_size 1024 \
  --val_preprocess_mode fixed --val_load_size 1024 --val_crop_size 1024 \
  --test_preprocess_mode fixed --test_load_size 1024 --test_crop_size 1024 \
  --batch_size 1 --num_workers 2 --seed 1234 --remat \
  --val_interval ${VAL_INT} --max_recon_dump 2 --max_host_rss_gb 40 --latest_interval 50 \
  --normalize_mean .5,.5,.5 --normalize_std 1.,1.,1."

. "$(dirname "$0")/flagship_phase_lib.sh"

if [ ! -d "${WARM}/params" ]; then
  echo "warm source ${WARM} missing a checkpoint" >&2
  exit 1
fi

echo "=== phase A: full objective, 1024x1024 native-res crops (${PA} epochs) ==="
run_phase phaseA "${WARM}" "${PA}"

echo "=== phase B: distortion-only fine-tune (${PB} epochs) ==="
run_phase phaseB "${OUT}/phaseA" "${PB}" \
  --no_g_gan_loss --no_d_gan_loss --no_vgg_loss --no_gan_feat_loss \
  --schedule_lr --lr_decay_patience 3

echo "=== held-out eval (fixed 1024x512, comparable to every other arm) ==="
for ph in phaseA phaseB; do
  python test.py --load_opt --opt_file ${OUT}/${ph}/opt.json \
    --checkpoints_dir ${OUT}/${ph} --save_dir ${OUT}/eval_${ph} \
    --root_dir ${ROOT} --mode val
done
echo "=== crop arm complete ==="
