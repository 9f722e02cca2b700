#!/usr/bin/env bash
# Round-3 high-resolution operating point: the LocalEnhancer coarse-to-fine
# generator at 2048x1024 — the reference's pix2pixHD scale-up recipe
# (networks.py:144-196 LocalEnhancer; --niter_fix_global in
# ctu/parsers + pix2pixHD heritage: train the 1024x512 global generator,
# then wrap it in a --netG local --ngf 32 enhancer at 2048x1024 with the
# global trunk frozen for the first N epochs).
#
# Configuration matches the trained compressed-visuals flagship (raw one-hot
# semantics + in-process HEVC-intra visuals at q30,
# tools/run_flagship_compressed.sh) so the warm start is the actual trained
# q30 checkpoint: tools/warmstart_local_from_global.py re-nests its netG
# under netG/global (minus the tail the LocalEnhancer drops), and
# --load_model partial-merges it (train/checkpoint.py) — enhancer stacks and
# the discriminator initialize fresh at the new resolution.
#
# Same 22/8 train/held-out split; all quality numbers come from the held-out
# 8 at 2048x1024.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
OUT=${OUT:-artifacts/flagship_r3_hires}
WARM_SRC=${WARM_SRC:-artifacts/flagship_r3_compressed_long/phaseB}
PA=${PA:-250}
PB=${PB:-120}
VAL_INT=${VAL_INT:-25}
QUALITY=${QUALITY:-30}
BATCH=${BATCH:-1}
FIX_GLOBAL=${FIX_GLOBAL:-50}
# phase-lib stall-guard contract: recipes whose steps-per-epoch differ from
# the flagship 22-image/batch-2 shape (11 log lines/epoch) must export their
# own LINES_PER_EPOCH. Derive the train-split size from ROOT (it is
# overridable), use ceiling division (drop_last=False pads the tail batch),
# and clamp to >= 1 so an over-large BATCH can't zero the stall guard's
# lines>=LINES_PER_EPOCH progress check.
N_TRAIN=$(find "${ROOT}/leftImg8bit/train" -name '*.png' 2>/dev/null | wc -l)
[ "${N_TRAIN}" -ge 1 ] || N_TRAIN=22
LPE=$(( (N_TRAIN + BATCH - 1) / BATCH ))
[ "${LPE}" -ge 1 ] || LPE=1
export LINES_PER_EPOCH=${LINES_PER_EPOCH:-${LPE}}

CFG="--use_compressed --ext heif --quality ${QUALITY} \
  --no_label_encoding --no_feat_encoding --no_generator_binarization \
  --netG local --ngf 32 --n_local_enhancers 1 --n_blocks_local 3"

# DEVCACHE: round 4 ran with the device cache OFF — at 2048x1024 the f32
# train+val caches cost 2.45GB of the 16GB HBM and the batch-1 GAN step
# OOM'd with them resident — re-exposing the relay client's per-upload
# host leak (handled by --max_host_rss_gb watchdog restarts, but paying
# their churn). Round 5's COMPACT cache (uint8+LUT images, narrowed id
# maps, data/device_cache.py — bit-identical) cuts the train cache ~4x
# (~0.6GB), so the default is back ON; DEVCACHE=0 restores the round-4
# behavior if the step still doesn't fit.
DEVCACHE=${DEVCACHE:-1}
COMMON="--dataset cityscapes --root_dir ${ROOT} --model pix2pixHD \
  --use_gt_semantics ${CFG} \
  --preprocess_mode fixed --load_size 2048 --crop_size 2048 \
  --val_preprocess_mode fixed --val_load_size 2048 --val_crop_size 2048 \
  --test_preprocess_mode fixed --test_load_size 2048 --test_crop_size 2048 \
  --batch_size ${BATCH} --num_workers 2 --seed 1234 --cache_images --remat \
  --device_cache ${DEVCACHE} \
  --val_interval ${VAL_INT} --max_recon_dump 2 --max_host_rss_gb 100 --latest_interval 100 \
  --normalize_mean .5,.5,.5 --normalize_std 1.,1.,1."

. "$(dirname "$0")/flagship_phase_lib.sh"

mkdir -p "${OUT}"
PHASEA_PREV=""
if [ -d "${WARM_SRC}/params" ]; then
  if [ ! -d "${OUT}/warm_init/params" ]; then
    echo "=== re-nesting ${WARM_SRC} for LocalEnhancer warm start ==="
    JAX_PLATFORMS=cpu python tools/warmstart_local_from_global.py \
      --src "${WARM_SRC}" --dst "${OUT}/warm_init"
  fi
  PHASEA_PREV=${OUT}/warm_init
fi

echo "=== phase A: full objective, enhancer at 2048x1024, global frozen ${FIX_GLOBAL} epochs (${PA} total) ==="
run_phase phaseA "${PHASEA_PREV}" "${PA}" --niter_fix_global "${FIX_GLOBAL}"

echo "=== phase B: distortion-only fine-tune (${PB} epochs) ==="
run_phase phaseB "${OUT}/phaseA" "${PB}" \
  --no_g_gan_loss --no_d_gan_loss --no_vgg_loss --no_gan_feat_loss \
  --schedule_lr --lr_decay_patience 3

echo "=== held-out eval (2048x1024) + .jpds v2 deploy round trip ==="
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

echo "=== hires LocalEnhancer training complete ==="
