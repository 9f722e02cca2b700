#!/usr/bin/env bash
# Reduced-scale demonstration of the reference's 3-phase recipe
# (scripts/pix2pixHD_bpg_train.sh; bpg binaries absent here -> jpg) on the
# bundled 30-image Cityscapes val subset. Produces committed artifacts under
# artifacts/three_phase/: per-phase metrics.jsonl + loss_log.txt + final eval.
#
# Scale: 256x128 fixed, ngf16/2down/3blocks, jpg q=50, multi-epoch per phase —
# small enough for the 1-CPU box, big enough to show losses converging,
# plateau-LR firing, cross-phase partial restore, and phase-3 PSNR gains.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=/root/reference/datasets/cityscapes_test_CVPR20_1024
OUT=${OUT:-artifacts/three_phase}
Q=50
export JAX_PLATFORMS=cpu

COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD --mode val \
  --use_gt_semantics --val_interval 1 --max_dataset_size 16 \
  --preprocess_mode fixed --load_size 256 --crop_size 256 \
  --val_preprocess_mode fixed --val_load_size 256 --val_crop_size 256 \
  --test_preprocess_mode fixed --test_load_size 256 --test_crop_size 256 \
  --ngf 16 --ndf 16 --n_downsample_global 2 --n_blocks_global 3 \
  --batch_size 2 --seed 1234 --schedule_lr --lr_decay_patience 2"

# Phase 1: semantics-only generator, no visuals, no distortion loss
python train.py ${COMMON} \
  --no_label_encoding --no_feat --no_generator_binarization \
  --no_distortion_loss --num_epochs 6 --always_save \
  --save_dir ${OUT}/phase1

# Phase 2: + jpg-compressed visuals, full GAN+VGG+featmatch+distortion
# (cross-phase partial restore: phase-1 netG head has different input
# channels, so it re-inits while the trunk restores)
python train.py ${COMMON} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization \
  --use_compressed --ext jpg --quality ${Q} \
  --normalize_mean '.5,.5,.5' --normalize_std '1.,1.,1.' \
  --load_model --checkpoints_dir ${OUT}/phase1 \
  --save_dir ${OUT}/phase2 --num_epochs 1 --always_save

python train.py ${COMMON} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization \
  --use_compressed --ext jpg --quality ${Q} \
  --normalize_mean '.5,.5,.5' --normalize_std '1.,1.,1.' \
  --load_model --checkpoints_dir ${OUT}/phase2 \
  --save_dir ${OUT}/phase2 --num_epochs 7

# Eval at end of phase 2
python test.py --load_opt --opt_file ${OUT}/phase2/opt.json \
  --checkpoints_dir ${OUT}/phase2 --save_dir ${OUT}/eval_phase2 \
  --root_dir ${ROOT} --mode val --max_dataset_size 8 --do_not_get_codes

# Phase 3: distortion-only fine-tune
python train.py ${COMMON} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization \
  --use_compressed --ext jpg --quality ${Q} \
  --normalize_mean '.5,.5,.5' --normalize_std '1.,1.,1.' \
  --load_model --checkpoints_dir ${OUT}/phase2 \
  --no_g_gan_loss --no_d_gan_loss --no_vgg_loss --no_gan_feat_loss \
  --save_dir ${OUT}/phase3 --num_epochs 8 --always_save

# Final eval
python test.py --load_opt --opt_file ${OUT}/phase3/opt.json \
  --checkpoints_dir ${OUT}/phase3 --save_dir ${OUT}/eval_phase3 \
  --root_dir ${ROOT} --mode val --max_dataset_size 8 --do_not_get_codes

echo "=== three-phase run complete ==="
python - <<'EOF'
import json
p2 = json.load(open("artifacts/three_phase/eval_phase2/metrics.json"))
p3 = json.load(open("artifacts/three_phase/eval_phase3/metrics.json"))
print(f"phase-2 PSNR {p2['PSNR']:.2f} dB / MS-SSIM {p2['MS-SSIM']:.4f}")
print(f"phase-3 PSNR {p3['PSNR']:.2f} dB / MS-SSIM {p3['MS-SSIM']:.4f}")
EOF
