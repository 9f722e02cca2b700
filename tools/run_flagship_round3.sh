#!/usr/bin/env bash
# Round-3 flagship training: the fully-learned codec (binarized netE4label
# semantics + binarized netE visuals -> GlobalGenerator, the bench.py
# configuration) trained at full reference scale (1024x512, ngf64/4down/
# 9blocks) on the REAL TPU via the reference's 3-phase recipe
# (/root/reference/scripts/pix2pixHD_bpg_train.sh structure):
#   phase 1  semantics-only generator, no visuals, no distortion loss
#   phase 2  + binarized visual features, full GAN+VGG+featmatch+distortion
#   phase 3  distortion-only fine-tune (the PSNR phase), plateau-LR
#
# Data: datasets/cityscapes_split — an explicit 22/8 train/held-out split of
# the bundled 30-image Cityscapes val subset (symlinks; last 3/3/2 images of
# frankfurt/lindau/munster held out). ALL quality numbers come from the
# held-out 8; training never sees them.
#
# VGG note: no torchvision in this image, so the perceptual loss uses the
# seeded random-init VGG19 (a random-feature perceptual loss) — documented
# deviation, see artifacts/flagship_r3/SUMMARY.md.
#
# Each phase: 1 epoch with --always_save (guarantees a checkpoint + resets
# the best-val gate to this phase's loss scale), then the long best-val run.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
OUT=${OUT:-artifacts/flagship_r3}
P1=${P1:-150}
P2=${P2:-800}
P3=${P3:-800}
VAL_INT=${VAL_INT:-25}

COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics --no_generator_binarization \
  --preprocess_mode fixed --load_size 1024 --crop_size 1024 \
  --val_preprocess_mode fixed --val_load_size 1024 --val_crop_size 1024 \
  --test_preprocess_mode fixed --test_load_size 1024 --test_crop_size 1024 \
  --batch_size 2 --num_workers 2 --seed 1234 --cache_images --remat \
  --val_interval ${VAL_INT} --max_recon_dump 2"

STD2="--normalize_mean .5,.5,.5 --normalize_std 1.,1.,1."

run_phase () {
  local name=$1 prev=$2 epochs=$3; shift 3
  local dir=${OUT}/${name}
  mkdir -p "${dir}"
  local load=""
  if [ -n "${prev}" ]; then load="--load_model --checkpoints_dir ${OUT}/${prev}"; fi
  # bootstrap epoch (always_save) unless resuming this phase
  if [ ! -d "${dir}/params" ]; then
    python train.py ${COMMON} "$@" ${load} \
      --save_dir "${dir}" --num_epochs 1 --always_save --val_interval 1
  fi
  python train.py ${COMMON} "$@" \
    --load_model --checkpoints_dir "${dir}" \
    --save_dir "${dir}" --num_epochs "${epochs}"
}

echo "=== phase 1: semantics-only (${P1} epochs) ==="
run_phase phase1 "" "${P1}" --no_feat --no_distortion_loss

echo "=== phase 2: + binarized visuals, full objective (${P2} epochs) ==="
run_phase phase2 phase1 "${P2}" ${STD2}

echo "=== phase 3: distortion-only fine-tune (${P3} epochs) ==="
run_phase phase3 phase2 "${P3}" ${STD2} \
  --no_g_gan_loss --no_d_gan_loss --no_vgg_loss --no_gan_feat_loss \
  --schedule_lr --lr_decay_patience 3

echo "=== held-out eval: phase 2 and phase 3 checkpoints ==="
for ph in phase2 phase3; do
  python test.py --load_opt --opt_file ${OUT}/${ph}/opt.json \
    --checkpoints_dir ${OUT}/${ph} --save_dir ${OUT}/eval_${ph} \
    --root_dir ${ROOT} --mode val
done

echo "=== flagship round-3 training complete ==="
