#!/usr/bin/env bash
# Three-phase BPG training recipe — the framework equivalent of the
# reference's scripts/pix2pixHD_bpg_train.sh (phase 1 trains the
# semantics-only generator; phases 2-3 add BPG visuals then distortion-only
# fine-tuning). Flags are 1:1 with the reference recipe (minus --gpu_ids,
# which is JAX-managed, and --tf_log, which is always-on logging here).
set -euo pipefail

Q=${Q:-33}                     # BPG quality factor
ROOT=${ROOT:-/path/to/cityscapes}
OUT=${OUT:-runs}

COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics --val_interval 1 \
  --val_preprocess_mode fixed --val_load_size 1024 --val_crop_size 1024 \
  --preprocess_mode fixed --load_size 1024 --crop_size 1024 --seed 1234"

# Phase 1: semantics-only generator, no visuals, no distortion loss
python train.py ${COMMON} \
  --no_label_encoding --no_feat --no_generator_binarization \
  --no_distortion_loss --num_epochs 50 \
  --save_dir ${OUT}/pix_novis_nodistortion_1024

# Phase 2: + BPG-compressed visuals, full GAN+VGG+featmatch+distortion
python train.py ${COMMON} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization \
  --use_compressed --ext bpg --quality ${Q} \
  --normalize_mean '.5,.5,.5' --normalize_std '1.,1.,1.' \
  --load_model --checkpoints_dir ${OUT}/pix_novis_nodistortion_1024 \
  --save_dir ${OUT}/pix_bpgq${Q}_1024_phase2 --num_epochs 1 --always_save

python train.py ${COMMON} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization \
  --use_compressed --ext bpg --quality ${Q} \
  --normalize_mean '.5,.5,.5' --normalize_std '1.,1.,1.' \
  --load_model --checkpoints_dir ${OUT}/pix_bpgq${Q}_1024_phase2 \
  --save_dir ${OUT}/pix_bpgq${Q}_1024_phase2 --num_epochs 29

# Phase 3: distortion-only fine-tune
python train.py ${COMMON} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization \
  --use_compressed --ext bpg --quality ${Q} \
  --normalize_mean '.5,.5,.5' --normalize_std '1.,1.,1.' \
  --load_model --checkpoints_dir ${OUT}/pix_bpgq${Q}_1024_phase2 \
  --no_g_gan_loss --no_d_gan_loss --no_vgg_loss --no_gan_feat_loss \
  --save_dir ${OUT}/pix_bpgq${Q}_1024_phase3 --num_epochs 50
