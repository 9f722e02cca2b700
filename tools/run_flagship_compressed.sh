#!/usr/bin/env bash
# Round-3 trained operating point for the reference's ACTUAL flagship
# configuration (scripts/pix2pixHD_bpg_train.sh:5-9): raw one-hot semantics
# (--no_label_encoding --no_feat_encoding --no_generator_binarization) +
# base-codec-compressed visuals, decoded through the GAN generator. The base
# codec is the in-process HEVC-intra bridge (heif q30 ~ 0.23 bpp on the
# held-out 8 — the mid-rate anchor of artifacts/flagship_r3/base_codec_rd.json);
# the reference shells out to bpgenc/bpgdec, absent here (CLAUDE.md).
#
# This is also the end-to-end proof of the round-3 .jpds v2 side-info format
# at a TRAINED quality point: compress.py embeds the base-codec payload +
# losslessly-coded label/instance maps, decompress.py reconstructs from the
# file alone, and eval rate accounts every byte.
#
# The device cache covers this config too: both flip variants of the
# base-codec output live on device (data/device_cache.py), so the
# steady-state loop performs neither the ~1.3s/image HEVC encode nor the
# leaking per-step H2D upload; the --max_host_rss_gb watchdog +
# run_phase restart loop remain as the backstop.
#
# Warm start: the trained fully-learned phase-3 checkpoint; the trunk/res
# blocks restore by path+shape, the input convs the channel change touches
# re-init (train/checkpoint.py merge_trees — the reference's
# base_model.py:62-97 cross-phase semantics).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
OUT=${OUT:-artifacts/flagship_r3_compressed}
# default warm source: the newest trained flagship checkpoint still on disk
# (the 128+128 phase3 checkpoints were reclaimed for disk; the 64+64 midrate
# trunk restores the same way — res blocks by path+shape, heads re-init on
# the input-channel change)
WARM=${WARM:-artifacts/flagship_r3_midrate/phaseB}
PA=${PA:-400}
PB=${PB:-300}
VAL_INT=${VAL_INT:-25}
QUALITY=${QUALITY:-30}

CFG="--use_compressed --ext heif --quality ${QUALITY} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization"

COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics ${CFG} \
  --preprocess_mode fixed --load_size 1024 --crop_size 1024 \
  --val_preprocess_mode fixed --val_load_size 1024 --val_crop_size 1024 \
  --test_preprocess_mode fixed --test_load_size 1024 --test_crop_size 1024 \
  --batch_size 2 --num_workers 2 --seed 1234 --cache_images --remat \
  --val_interval ${VAL_INT} --max_recon_dump 2 --max_host_rss_gb 100 --latest_interval 100 \
  --normalize_mean .5,.5,.5 --normalize_std 1.,1.,1."

. "$(dirname "$0")/flagship_phase_lib.sh"

PHASEA_PREV=""
if [ -d "${WARM}/params" ]; then
  echo "=== warm start from ${WARM} ==="
  PHASEA_PREV=${WARM}
fi

echo "=== phase A: full objective, compressed visuals + raw semantics (${PA} epochs) ==="
run_phase phaseA "${PHASEA_PREV}" "${PA}"

echo "=== phase B: distortion-only fine-tune (${PB} epochs) ==="
run_phase phaseB "${OUT}/phaseA" "${PB}" \
  --no_g_gan_loss --no_d_gan_loss --no_vgg_loss --no_gan_feat_loss \
  --schedule_lr --lr_decay_patience 3

echo "=== held-out eval + .jpds v2 deploy round trip ==="
for ph in phaseA phaseB; do
  python test.py --load_opt --opt_file ${OUT}/${ph}/opt.json \
    --checkpoints_dir ${OUT}/${ph} --save_dir ${OUT}/eval_${ph} \
    --root_dir ${ROOT} --mode val
done
python compress.py --load_opt --opt_file ${OUT}/phaseB/opt.json \
  --checkpoints_dir ${OUT}/phaseB --save_dir ${OUT}/bits_phaseB \
  --root_dir ${ROOT} --mode val
python decompress.py --input ${OUT}/bits_phaseB \
  --load_opt --opt_file ${OUT}/phaseB/opt.json \
  --checkpoints_dir ${OUT}/phaseB --save_dir ${OUT}/recon_phaseB

echo "=== flagship compressed-visuals training complete ==="
