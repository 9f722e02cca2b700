import dataclasses

import pytest

from jpdse_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    apply_dataset_defaults,
    derive_eval_config,
    set_by_path,
)


def flagship_train_config() -> Config:
    """The scripts/pix2pixHD_bpg_train.sh phase-2 configuration."""
    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.model.no_label_encoding = True
    cfg.model.no_feat_encoding = True
    cfg.model.no_generator_binarization = True
    cfg.codec.use_compressed = True
    cfg.codec.ext = "bpg"
    cfg.codec.quality = (33,)
    cfg.data.normalize_std = (1.0, 1.0, 1.0)
    cfg.validate()
    return cfg


def test_dataset_defaults():
    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    assert cfg.data.num_labels == 35
    assert cfg.data.preprocess.preprocess_mode == "fixed"
    assert cfg.data.preprocess.aspect_ratio == 2.0

    cfg = Config()
    cfg.data.dataset = "ade20k"
    apply_dataset_defaults(cfg)
    assert cfg.data.num_labels == 150 and cfg.data.contain_dontcare_label
    assert cfg.data.semantic_nc == 151


def test_channel_arithmetic_flagship():
    """BPG phase-2 config: raw one-hot labels (35) + edge (1) + raw RGB (3)."""
    cfg = flagship_train_config()
    assert cfg.semantics_nc == 35
    assert cfg.netG_input_nc == 35 + 1 + 3
    assert cfg.netD_input_nc == 35 + 3 + 1
    assert not cfg.use_netE and not cfg.use_netE4label


def test_channel_arithmetic_learned():
    """Fully learned codec: encoded labels + encoded visuals."""
    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.model.no_generator_binarization = True
    cfg.validate()
    assert cfg.semantics_nc == cfg.model.label_encoder_out_channels == 36
    assert cfg.netG_input_nc == 36 + cfg.model.feat_num
    assert cfg.use_netE and cfg.use_netE4label
    assert cfg.netE4label_input_nc == 36  # 35 labels + edge


def test_binarize_contradiction_rejected():
    cfg = Config()
    with pytest.raises(ValueError):
        # encoders binarized AND generator binarized
        cfg2 = dataclasses.replace(cfg)
        cfg2.model.no_generator_binarization = False
        cfg2.validate()


def test_remat_granularity_typo_rejected():
    """A typo'd remat_granularity must be a config error, not a silent
    no-remat (which would surface as an unexplained OOM)."""
    cfg = Config()
    cfg.model.no_generator_binarization = True
    cfg.optim.remat = True
    cfg.optim.remat_granularity = "blocks"  # typo
    with pytest.raises(ValueError, match="remat_granularity"):
        cfg.validate()
    cfg.optim.remat_granularity = "decode"
    cfg.validate()


def test_json_round_trip(tmp_path):
    cfg = flagship_train_config()
    p = tmp_path / "opt.json"
    cfg.save(str(p))
    cfg2 = Config.load(str(p))
    assert cfg2.to_dict() == cfg.to_dict()


def test_derive_eval_config():
    cfg = flagship_train_config()
    cfg.data.batch_size = 4
    cfg.data.val_preprocess.preprocess_mode = "fixed"
    cfg.data.val_preprocess.crop_size = 1024
    val = derive_eval_config(cfg, "val")
    assert val.mode == "val" and not val.is_train
    assert val.data.batch_size == 1
    assert val.data.preprocess.crop_size == 1024
    # original untouched
    assert cfg.data.batch_size == 4 and cfg.is_train


def test_set_by_path():
    cfg = Config()
    set_by_path(cfg, "data.preprocess.load_size", 2048)
    assert cfg.data.preprocess.load_size == 2048
    with pytest.raises(AttributeError):
        set_by_path(cfg, "data.nonexistent", 1)
