#!/usr/bin/env bash
# Round-4 perceptual-loss A/B (VERDICT missing #3): every round-3 operating
# point optimized a RANDOM-INIT VGG perceptual term (the pretrained
# torchvision weights are unfetchable — zero egress). This trains three
# short, internally-paired arms of the q15 compressed-visuals flagship
# (same warm start, seed, split, epochs; only the perceptual term differs):
#
#   arm a (vgg_rand): the round-3 default — random-init VGG19 features
#   arm b (no_vgg):   --no_vgg_loss (GAN + feat-match + distortion only;
#                     feat-match IS the discriminator-feature perceptual
#                     term, pix2pixHD's own)
#   arm c (vgg_seg):  VGG19 features TRAINED IN-ENVIRONMENT on the bundled
#                     Cityscapes segmentation labels (tools/train_seg_vgg.py
#                     -> --vgg_weights_path), the judge-suggested substitute
#
# Held-out PSNR / MS-SSIM + galleries decide: adopt arm c, or record the
# negative. Reference match: networks.py:474-504 (VGGLoss).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
OUT=${OUT:-artifacts/r4_perceptual_ab}
WARM=${WARM:-artifacts/flagship_r3_compressed_long/phaseB}
PA=${PA:-100}
VAL_INT=${VAL_INT:-25}
QUALITY=${QUALITY:-15}
SEGVGG=${SEGVGG:-artifacts/seg_vgg/vgg19_seg.npz}

CFG="--use_compressed --ext heif --quality ${QUALITY} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization"

COMMON_BASE="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics ${CFG} \
  --preprocess_mode fixed --load_size 1024 --crop_size 1024 \
  --val_preprocess_mode fixed --val_load_size 1024 --val_crop_size 1024 \
  --test_preprocess_mode fixed --test_load_size 1024 --test_crop_size 1024 \
  --batch_size 2 --num_workers 2 --seed 1234 --cache_images --remat \
  --val_interval ${VAL_INT} --max_recon_dump 2 --max_host_rss_gb 100 --latest_interval 100 \
  --normalize_mean .5,.5,.5 --normalize_std 1.,1.,1."

. "$(dirname "$0")/flagship_phase_lib.sh"

if [ ! -d "${WARM}/params" ]; then
  echo "warm source ${WARM} missing a checkpoint" >&2
  exit 1
fi

if [ ! -f "${SEGVGG}" ]; then
  echo "=== training the in-environment seg-VGG feature net ==="
  python tools/train_seg_vgg.py --out "$(dirname "${SEGVGG}")"
fi

run_arm () {
  local arm=$1; shift
  COMMON="${COMMON_BASE}"
  echo "=== arm ${arm}: ${PA} epochs from ${WARM} ==="
  run_phase "${arm}" "${WARM}" "${PA}" "$@"
  python test.py --load_opt --opt_file ${OUT}/${arm}/opt.json \
    --checkpoints_dir ${OUT}/${arm} --save_dir ${OUT}/eval_${arm} \
    --root_dir ${ROOT} --mode val
}

run_arm vgg_rand
run_arm no_vgg --no_vgg_loss
run_arm vgg_seg --vgg_weights_path "${SEGVGG}"

echo "=== perceptual A/B arms complete ==="
for arm in vgg_rand no_vgg vgg_seg; do
  echo "--- ${arm} ---"; cat ${OUT}/eval_${arm}/metrics.json 2>/dev/null || true
done
