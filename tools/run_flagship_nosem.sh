#!/usr/bin/env bash
# Round-4 matched-rate SEMANTICS ABLATION — the B-side of the paper's
# central claim (reference README.md:7: high-level semantics improve joint
# perception-distortion at a given rate; ablation switches at
# ctu/models/pix2pixHD_model.py:583-606).
#
# Identical recipe to the trained compressed-visuals flagships
# (tools/run_flagship_compressed.sh — same 22/8 split, seed, warm source,
# PA=300/PB=100, batch 2) with the semantics REMOVED (--no_label
# --no_instance: no one-hot map, no edge map, netG sees only the
# base-codec-decoded visual) and the rate they freed re-spent on base-codec
# quality so TOTAL bpp matches the semantics run:
#
#   A-side q10 flagship: 0.0658 base + 0.0604 lossless semantics = 0.1262 bpp
#   B-side (this, QUALITY=20):  0.1236 bpp base only  (match within 0.003)
#   A-side q15 flagship: 0.0964 base + 0.0604 semantics = 0.1568 bpp
#   B-side (this, QUALITY=23):  0.1583 bpp base only   (match within 0.002)
#
# (base-codec rates measured on the held-out 8 by tools/base_codec_rd.py —
# artifacts/flagship_r3/base_codec_rd.json + a q21-25 fill-in sweep:
# q21/22 -> 0.1403, q23/24 -> 0.1583, q25 -> 0.1790 bpp.)
#
# Warm start: the same trained q30 phase-B checkpoint the A-side runs warm
# from (artifacts/flagship_r3_compressed_long/phaseB). The trunk/res blocks
# restore by path+shape; the input convs the channel change touches (netG
# head: 40 -> 3 channels, netD head) re-init — the reference's cross-phase
# partial-restore semantics (base_model.py:62-97).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
QUALITY=${QUALITY:-20}
OUT=${OUT:-artifacts/flagship_r4_nosem_q${QUALITY}}
WARM=${WARM:-artifacts/flagship_r3_compressed_long/phaseB}
PA=${PA:-300}
PB=${PB:-100}
VAL_INT=${VAL_INT:-25}

CFG="--use_compressed --ext heif --quality ${QUALITY} \
  --no_label --no_instance \
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

echo "=== phase A: full objective, compressed visuals, NO semantics (${PA} epochs) ==="
run_phase phaseA "${PHASEA_PREV}" "${PA}"

echo "=== phase B: distortion-only fine-tune (${PB} epochs) ==="
run_phase phaseB "${OUT}/phaseA" "${PB}" \
  --no_g_gan_loss --no_d_gan_loss --no_vgg_loss --no_gan_feat_loss \
  --schedule_lr --lr_decay_patience 3

echo "=== held-out eval + .jpds deploy round trip ==="
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

echo "=== no-semantics ablation run complete ==="
