#!/usr/bin/env bash
# QF-sweep evaluation — equivalent of the reference's
# scripts/pix2pixHD_bpg_test.sh: reload each checkpoint's saved config and
# evaluate on the bundled Cityscapes test subset.
set -euo pipefail

ROOT=${ROOT:-datasets/cityscapes_test_CVPR20_1024}
RUNS=${RUNS:-runs}
OUT=${OUT:-out}

for q in 51 48 45 42; do
  python test.py --load_opt --opt_file ${RUNS}/pix_bpgq${q}_1024/opt.json \
    --checkpoints_dir ${RUNS}/pix_bpgq${q}_1024 --do_not_get_codes \
    --save_dir ${OUT}/q${q} --root_dir ${ROOT}
done
