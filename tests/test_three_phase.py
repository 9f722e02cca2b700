"""Micro-scale 3-phase recipe CI test (scripts/pix2pixHD_bpg_train.sh,
reference scripts/pix2pixHD_bpg_train.sh:5-9): phase 1 (semantics-only, no
distortion) -> phase 2 (+compressed visuals, full objective; cross-phase
PARTIAL restore — netG head re-inits because its input channels change) ->
phase 3 (distortion-only fine-tune). Asserts the partial restore happened
and that phase-3 fine-tuning improves PSNR over the phase-2 starting point.

The committed full demonstration (256x128, multi-epoch, plateau-LR firing)
lives in artifacts/three_phase/ (produced by tools/run_three_phase.sh)."""

import json
import os
import subprocess
import sys

import pytest

CITYSCAPES_ROOT = "/root/reference/datasets/cityscapes_test_CVPR20_1024"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CITYSCAPES_ROOT), reason="bundled cityscapes subset not present"
)

COMMON = (
    "--dataset cityscapes --root_dir {root} --model pix2pixHD --mode val "
    "--use_gt_semantics --val_interval 1 --max_dataset_size 4 "
    "--preprocess_mode fixed --load_size 128 --crop_size 128 "
    "--val_preprocess_mode fixed --val_load_size 128 --val_crop_size 128 "
    "--test_preprocess_mode fixed --test_load_size 128 --test_crop_size 128 "
    "--ngf 8 --ndf 8 --n_downsample_global 2 --n_blocks_global 1 "
    "--batch_size 2 --seed 0 --no_vgg_loss "
)


def run(script, args, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args.split(),
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


def evaluate(opt_file, ckpt, out):
    r = run(
        "test.py",
        f"--load_opt --opt_file {opt_file} --checkpoints_dir {ckpt} "
        f"--save_dir {out} --root_dir {CITYSCAPES_ROOT} --mode val "
        f"--max_dataset_size 4 --do_not_get_codes",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(open(os.path.join(out, "metrics.json")).read())


def test_three_phase_recipe(tmp_path):
    common = COMMON.format(root=CITYSCAPES_ROOT)
    p1, p2, p3 = tmp_path / "p1", tmp_path / "p2", tmp_path / "p3"

    # phase 1: semantics-only, no distortion loss
    r = run(
        "train.py",
        common + "--no_label_encoding --no_feat --no_generator_binarization "
        f"--no_distortion_loss --num_epochs 1 --always_save --save_dir {p1}",
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # phase 2: + jpg visuals, full objective, cross-phase partial restore
    phase2_flags = (
        common + "--no_label_encoding --no_feat_encoding "
        "--no_generator_binarization --use_compressed --ext jpg --quality 50 "
        "--normalize_std 1.,1.,1. "
    )
    r = run(
        "train.py",
        phase2_flags
        + f"--load_model --checkpoints_dir {p1} --num_epochs 1 "
        f"--always_save --save_dir {p2}",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # partial restore: some leaves matched, but not all (netG head re-inits
    # because phase-2 input has 3 extra visual channels)
    import re

    m = re.search(r"restored params from .*: (\d+)/(\d+) leaves matched", r.stdout)
    assert m, r.stdout[-2000:]
    matched, total = int(m.group(1)), int(m.group(2))
    assert 0 < matched < total, (matched, total)

    psnr_phase2_start = evaluate(
        f"{p2}/opt.json", p2, tmp_path / "eval_p2"
    )["PSNR"]

    # phase 3: distortion-only fine-tune (a few epochs of direct L1 descent)
    r = run(
        "train.py",
        phase2_flags
        + f"--load_model --checkpoints_dir {p2} --num_epochs 4 "
        "--no_g_gan_loss --no_d_gan_loss --no_gan_feat_loss "
        f"--always_save --save_dir {p3}",
        timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    psnr_phase3 = evaluate(f"{p3}/opt.json", p3, tmp_path / "eval_p3")["PSNR"]

    assert psnr_phase3 > psnr_phase2_start, (psnr_phase3, psnr_phase2_start)
