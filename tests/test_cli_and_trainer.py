"""CLI parsing + end-to-end trainer smoke tests on the bundled Cityscapes
subset (tiny model widths so CPU compile stays fast)."""

import os

import numpy as np
import pytest

from jpdse_tpu.cli import parse_config
from jpdse_tpu.config import derive_eval_config
from jpdse_tpu.data import create_dataloader
from jpdse_tpu.trainer import Trainer

CITYSCAPES_ROOT = "/root/reference/datasets/cityscapes_test_CVPR20_1024"

requires_data = pytest.mark.skipif(
    not os.path.isdir(CITYSCAPES_ROOT), reason="bundled cityscapes subset not present"
)


def test_parse_config_reference_recipe():
    """The phase-2 BPG recipe flags parse into the right config fields."""
    argv = (
        "--dataset cityscapes --root_dir /data --model pix2pixHD "
        "--no_label_encoding --no_feat_encoding --num_epochs 29 "
        "--use_gt_semantics --val_interval 1 --val_preprocess_mode fixed "
        "--val_load_size 1024 --val_crop_size 1024 --preprocess_mode fixed "
        "--load_size 1024 --crop_size 1024 --seed 1234 "
        "--no_generator_binarization --use_compressed "
        "--normalize_mean .5,.5,.5 --normalize_std 1.,1.,1. "
        "--save_dir /tmp/x --quality 33 --ext bpg --always_save"
    ).split()
    cfg = parse_config(argv, is_train=True)
    assert cfg.data.dataset == "cityscapes"
    assert cfg.data.num_labels == 35  # dataset default applied
    assert cfg.model.no_label_encoding and cfg.model.no_feat_encoding
    assert cfg.model.no_generator_binarization
    assert cfg.codec.use_compressed and cfg.codec.ext == "bpg"
    assert cfg.codec.quality == (33,)
    assert cfg.data.normalize_std == (1.0, 1.0, 1.0)
    assert cfg.data.preprocess.crop_size == 1024
    assert cfg.data.val_preprocess.crop_size == 1024
    assert cfg.optim.seed == 1234 and cfg.optim.num_epochs == 29
    assert cfg.always_save
    assert cfg.netG_input_nc == 35 + 1 + 3


def test_parse_config_explicit_overrides_dataset_defaults():
    cfg = parse_config(
        "--dataset cityscapes --num_labels 20 --root_dir /x".split(), is_train=True
    )
    assert cfg.data.num_labels == 20  # explicit flag wins over dataset default


def test_opt_file_round_trip(tmp_path):
    cfg = parse_config(
        "--dataset cityscapes --root_dir /d --lr 0.001 --ngf 32".split(),
        is_train=True,
    )
    p = tmp_path / "opt.json"
    cfg.save(str(p))
    cfg2 = parse_config(
        f"--load_opt --opt_file {p} --lr 0.0005".split(), is_train=False
    )
    assert cfg2.model.ngf == 32  # loaded default
    assert cfg2.optim.lr == 0.0005  # explicit flag overrides loaded value
    assert not cfg2.is_train


def _tiny_e2e_cfg(tmp_path, mode_flags=""):
    argv = (
        f"--dataset cityscapes --root_dir {CITYSCAPES_ROOT} --model pix2pixHD "
        "--no_label_encoding --no_feat_encoding --no_generator_binarization "
        "--preprocess_mode fixed --load_size 128 --crop_size 128 "
        "--val_preprocess_mode fixed --val_load_size 128 --val_crop_size 128 "
        "--test_preprocess_mode fixed --test_load_size 128 --test_crop_size 128 "
        "--ngf 8 --ndf 8 --n_downsample_global 2 --n_blocks_global 1 "
        "--num_D 2 --batch_size 2 --max_dataset_size 4 --seed 0 "
        "--no_vgg_loss --num_epochs 1 "
        f"--save_dir {tmp_path}/run " + mode_flags
    ).split()
    cfg = parse_config(argv, is_train=True)
    # 'train' mode dir doesn't exist in the bundled subset; point at val
    cfg.mode = "val"
    return cfg


@requires_data
def test_end_to_end_train_val_save_load(tmp_path):
    """Two real train steps on real data, validation, checkpoint, reload."""
    cfg = _tiny_e2e_cfg(tmp_path)
    val_cfg = derive_eval_config(cfg, mode="val")
    val_cfg.mode = "val"
    loader = create_dataloader(cfg)
    val_loader = create_dataloader(val_cfg)

    batch = next(iter(loader))
    trainer = Trainer(cfg, mode="train", sample_batch=batch)
    m1 = trainer.step(batch)
    m2 = trainer.step(batch)
    assert np.isfinite(m1["G_Distortion"]) and np.isfinite(m2["loss_D"])
    assert trainer.steps_taken == 2

    val_batch = next(iter(val_loader))
    loss = trainer.get_eval_loss(val_batch)
    assert 0 < loss < 255  # uint8-scale distortion

    recon = trainer.get_img(val_batch)
    assert recon.shape == (1, 64, 128, 3)

    trainer.save(epoch=0, val_loss=loss)
    trainer2 = Trainer(cfg, mode="train", sample_batch=batch)
    trainer2.cfg.checkpoints_dir = cfg.save_dir
    trainer2.load()
    assert trainer2.steps_taken == 2
    assert trainer2.start_epoch == 1
    # restored params reproduce the eval loss
    assert abs(trainer2.get_eval_loss(val_batch) - loss) < 1e-4


@requires_data
def test_end_to_end_codes_and_rate(tmp_path):
    """Learned-codec configuration produces binary codes + rate estimates."""
    argv = (
        f"--dataset cityscapes --root_dir {CITYSCAPES_ROOT} --model pix2pixHD "
        "--no_generator_binarization "
        "--preprocess_mode fixed --load_size 128 --crop_size 128 "
        "--ngf 8 --ndf 8 --nef 8 --ne4lf 8 --n_downsample_global 2 "
        "--n_blocks_global 1 --n_downsample_E 2 --n_downsample_E4label 2 "
        "--encoder_binarizer_out_channels 8 --label_encoder_binarizer_out_channels 8 "
        "--batch_size 1 --max_dataset_size 2 --seed 0 --no_vgg_loss "
        f"--save_dir {tmp_path}/run2"
    ).split()
    cfg = parse_config(argv, is_train=True)
    cfg.mode = "val"
    loader = create_dataloader(cfg)
    batch = next(iter(loader))
    trainer = Trainer(cfg, mode="test", sample_batch=batch)
    codes = trainer.get_code(batch)
    assert set(np.unique(codes)) <= {0.0, 1.0}
    shannon, actual = trainer.get_eval_rate(batch)
    assert 0 <= shannon <= actual
    assert actual > 0


def test_profile_dir_writes_trace(tmp_path):
    """--profile_dir captures a jax.profiler trace of the first epoch
    (utils/profiling.py trace); the trace directory must materialize."""
    import numpy as np

    from jpdse_tpu.utils.profiling import trace

    import jax
    import jax.numpy as jnp

    d = tmp_path / "prof"
    with trace(str(d)):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    files = list(d.rglob("*"))
    assert any(f.is_file() for f in files), files

    # no-op form
    with trace(None):
        pass
