"""ADE20K / CLIC / custom dataset adapters on synthetic temp-dir data."""

import numpy as np
import pytest
from PIL import Image

from jpdse_tpu.config import Config, apply_dataset_defaults
from jpdse_tpu.data import create_dataloader, find_dataset_using_name


def _cfg(dataset, root, **kw):
    cfg = Config()
    cfg.data.dataset = dataset
    apply_dataset_defaults(cfg)
    cfg.data.root_dir = str(root)
    cfg.mode = "val"
    cfg.is_train = False
    cfg.data.preprocess.preprocess_mode = "fixed"
    cfg.data.preprocess.crop_size = 64
    cfg.data.preprocess.aspect_ratio = 1.0
    for k, v in kw.items():
        setattr(cfg.data, k, v)
    return cfg


def test_ade20k_dataset(tmp_path, rng):
    root = tmp_path / "ade" / "validation"
    root.mkdir(parents=True)
    for i in range(2):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / f"ADE_val_{i:08d}.jpg")
        seg = np.zeros((48, 64, 3), np.uint8)
        seg[..., 0] = rng.integers(0, 10, (48, 64))  # R: classes
        seg[..., 2] = rng.integers(0, 5, (48, 64))  # B: instances
        Image.fromarray(seg).save(root / f"ADE_val_{i:08d}_seg.png")

    cfg = _cfg("ade20k", tmp_path / "ade")
    ds = find_dataset_using_name("ade20k")(cfg)
    assert len(ds) == 2
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert s["image"].shape == (64, 64, 3)
    assert s["label"].shape == (64, 64)
    # unknown(0) remapped to num_labels; others shifted down by one
    assert s["label"].max() <= cfg.data.num_labels
    assert s["instance"].dtype == np.int32


def test_clic_dataset(tmp_path, rng):
    for sub in ("img", "sem"):
        (tmp_path / "val" / sub).mkdir(parents=True)
    for name in ("alpha", "beta"):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "val" / "img" / f"{name}.png")
        sem = rng.integers(0, 20, (48, 64)).astype(np.uint8)
        Image.fromarray(sem).save(tmp_path / "val" / "sem" / f"{name}_sem_map.png")
        ins = rng.integers(0, 6, (48, 64)).astype(np.uint8)
        Image.fromarray(ins).save(tmp_path / "val" / "sem" / f"{name}_ins_map.png")

    cfg = _cfg("clic", tmp_path)
    ds = find_dataset_using_name("clic")(cfg)
    assert len(ds) == 2
    s = ds.__getitem__(1, rng=np.random.default_rng(0))
    assert s["image"].shape == (64, 64, 3)
    assert s["label"].shape == (64, 64)
    assert s["instance"].shape == (64, 64)


def test_clic_power_of_32_mode(tmp_path, rng):
    """CLIC default preprocess 'none' snaps to multiples of 32."""
    (tmp_path / "val" / "img").mkdir(parents=True)
    (tmp_path / "val" / "sem").mkdir(parents=True)
    img = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "val" / "img" / "x.png")
    Image.fromarray(np.zeros((50, 70), np.uint8)).save(
        tmp_path / "val" / "sem" / "x_sem_map.png"
    )
    Image.fromarray(np.zeros((50, 70), np.uint8)).save(
        tmp_path / "val" / "sem" / "x_ins_map.png"
    )
    cfg = _cfg("clic", tmp_path)
    cfg.data.preprocess.preprocess_mode = "none"
    ds = find_dataset_using_name("clic")(cfg)
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert s["image"].shape == (64, 64, 3)  # 50->64? round(50/32)=2 -> 64, round(70/32)=2 -> 64
    assert s["label"].shape == (64, 64)


def test_custom_dataset(tmp_path, rng):
    (tmp_path / "val").mkdir()
    for i in range(3):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "val" / f"img_{i}.png")
    cfg = Config()
    cfg.data.dataset = "custom"
    apply_dataset_defaults(cfg)
    cfg.data.root_dir = str(tmp_path)
    cfg.mode = "val"
    cfg.is_train = False
    cfg.data.preprocess.preprocess_mode = "fixed"
    cfg.data.preprocess.crop_size = 32
    cfg.data.preprocess.aspect_ratio = 1.0
    loader = create_dataloader(cfg)
    batch = next(iter(loader))
    assert batch["image"].shape == (1, 32, 32, 3)
    assert "label" not in batch
    # custom defaults: identity normalization (mean 0 / std 1)
    assert batch["image"].min() >= 0.0 and batch["image"].max() <= 1.0

    # misconfigured (labels on an image-only dataset) -> clear error
    cfg2 = Config()
    cfg2.data.dataset = "custom"
    cfg2.data.root_dir = str(tmp_path)
    with pytest.raises(ValueError, match="no_label"):
        find_dataset_using_name("custom")(cfg2)
