#!/usr/bin/env bash
# Round-5 CHEAP-SEMANTICS arm (round-4 VERDICT ask #6): the ablation's
# per-class data says semantics help at equal input but cost too much at
# 0.0604 bpp. This trains the semantics-capable flagship with the maps
# shipped at 1/SEM_F resolution (--sem_downsample; measured side rates on
# the held-out 8: f=1 0.0604, f=2 0.0274, f=4 0.0141, f=8 0.0080 bpp) and
# the saved rate re-spent on base-codec quality:
#
#   SEM_F=2 @ q15:  0.0964 base + 0.0274 sem = 0.1238 bpp total
#     — matched to BOTH contested q10-point rows (A-side semantics 0.1262,
#       B-side no-semantics 0.1244). If degraded semantics keep most of
#       their mechanism value at half the price, this arm wins the point;
#       if not, the negative closes the cheap-semantics question here.
#
# Same recipe/warm source as every round-4 arm (q30 flagship phaseB, every
# leaf restores — the architecture is unchanged by sem_downsample).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-datasets/cityscapes_split}
QUALITY=${QUALITY:-15}
SEM_F=${SEM_F:-2}
OUT=${OUT:-artifacts/r5_semdown_f${SEM_F}_q${QUALITY}}
WARM=${WARM:-artifacts/flagship_r3_compressed_long/phaseB}
PA=${PA:-300}
PB=${PB:-100}
VAL_INT=${VAL_INT:-25}

CFG="--use_compressed --ext heif --quality ${QUALITY} --sem_downsample ${SEM_F} \
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

if [ ! -d "${WARM}/params" ]; then
  echo "warm source ${WARM} missing a checkpoint" >&2
  exit 1
fi

echo "=== phase A: full objective, sem/${SEM_F} + q${QUALITY} visuals (${PA} epochs) ==="
run_phase phaseA "${WARM}" "${PA}"

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

echo "=== cheap-semantics arm complete ==="
