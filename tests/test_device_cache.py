"""Device-resident dataset cache (data/device_cache.py): on-device batch
assembly must be bit-identical to host assembly, and the watchdog-driven
chunked resume (save_dir/latest) must continue a run losslessly."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from jpdse_tpu.config import Config, apply_dataset_defaults
from jpdse_tpu.data import create_dataloader
from jpdse_tpu.data.device_cache import DeviceDatasetCache, maybe_device_cache

CITYSCAPES_ROOT = "/root/reference/datasets/cityscapes_test_CVPR20_1024"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CITYSCAPES_ROOT), reason="bundled cityscapes subset not present"
)


def train_cfg(n=6) -> Config:
    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.data.root_dir = CITYSCAPES_ROOT
    cfg.mode = "val"  # bundled subset lives under val/
    cfg.is_train = True
    cfg.data.preprocess.preprocess_mode = "fixed"
    cfg.data.preprocess.crop_size = 256
    cfg.data.preprocess.aspect_ratio = 2.0
    cfg.data.batch_size = 2
    cfg.data.max_dataset_size = n
    cfg.data.cache_images = True
    cfg.data.num_workers = 2
    cfg.optim.seed = 7
    return cfg


def test_device_batches_bit_identical_to_host():
    cfg = train_cfg()
    host_loader = create_dataloader(cfg)
    meta_loader = create_dataloader(cfg)
    cache = maybe_device_cache(meta_loader, cfg)
    assert cache is not None
    meta_loader.meta_only = True

    saw_flip, saw_noflip = False, False
    for epoch in range(2):  # 2 epochs: distinct shuffles + flip draws
        host_loader.set_epoch(epoch)
        meta_loader.set_epoch(epoch)
        for hb, mb in zip(host_loader, meta_loader):
            assert list(hb["path"]) == list(mb["path"])
            saw_flip |= bool(np.any(mb["flip"]))
            saw_noflip |= not np.all(mb["flip"])
            placed = cache.place(mb)
            for k in ("image", "label", "instance"):
                np.testing.assert_array_equal(
                    np.asarray(placed[k]), hb[k], err_msg=f"{k} epoch {epoch}"
                )
    assert saw_flip and saw_noflip  # both flip branches exercised


def test_gating():
    cfg = train_cfg()
    # no cache_images -> no device cache
    cfg2 = train_cfg()
    cfg2.data.cache_images = False
    assert maybe_device_cache(create_dataloader(cfg2), cfg2) is None
    # HBM budget guard
    loader = create_dataloader(cfg)
    assert maybe_device_cache(loader, cfg, max_gb=1e-6) is None
    # flag off
    cfg4 = train_cfg()
    cfg4.data.device_cache = False
    assert maybe_device_cache(create_dataloader(cfg4), cfg4) is None


def test_compressed_device_batches_bit_identical(tmp_path):
    """use_compressed configs: both flip variants of the base-codec output
    live on device; assembled batches must equal host batches exactly."""
    cfg = train_cfg(n=4)
    cfg.codec.use_compressed = True
    cfg.codec.ext = "jpg"
    cfg.codec.quality = (60,)
    host_loader = create_dataloader(cfg)
    meta_loader = create_dataloader(cfg)
    cache = maybe_device_cache(meta_loader, cfg)
    assert cache is not None
    meta_loader.meta_only = True
    for epoch in range(2):
        host_loader.set_epoch(epoch)
        meta_loader.set_epoch(epoch)
        for hb, mb in zip(host_loader, meta_loader):
            placed = cache.place(mb)
            for k in ("image", "label", "instance", "compressed"):
                np.testing.assert_array_equal(
                    np.asarray(placed[k]), hb[k], err_msg=f"{k} epoch {epoch}"
                )


def test_val_cache_replays_identical_batches():
    """CachedValBatches must replay bit-identical batches across passes and
    match the host loader's batches exactly (eval never flips)."""
    from jpdse_tpu.config import derive_eval_config
    from jpdse_tpu.data.device_cache import maybe_val_cache

    cfg = train_cfg(n=4)
    val_cfg = derive_eval_config(cfg, "val")
    val_loader = create_dataloader(val_cfg)
    cache = maybe_val_cache(val_loader, cfg, cap=30)
    assert cache is not None and len(cache) == len(val_loader)
    for _ in range(2):  # two passes: replay must be stable
        for hb, cb in zip(val_loader, cache):
            assert list(hb["path"]) == list(cb["path"])
            for k in ("image", "label", "instance"):
                np.testing.assert_array_equal(np.asarray(cb[k]), hb[k])


def test_val_cache_gating():
    from jpdse_tpu.config import derive_eval_config
    from jpdse_tpu.data.device_cache import maybe_val_cache

    cfg = train_cfg()
    val_cfg = derive_eval_config(cfg, "val")
    # mesh -> decline (sharded eval places batches per-shard)
    assert maybe_val_cache(create_dataloader(val_cfg), cfg, mesh=object()) is None
    # HBM budget -> decline
    assert maybe_val_cache(create_dataloader(val_cfg), cfg, max_gb=1e-6) is None
    # flag off -> decline
    cfg2 = train_cfg()
    cfg2.data.device_cache = False
    assert maybe_val_cache(create_dataloader(val_cfg), cfg2) is None


def test_unstackable_dataset_declines(monkeypatch, capsys):
    """Variable-size datasets (preprocess 'none' over a mixed-size folder)
    cannot be stacked into one device array; the cache must decline to the
    host path instead of killing train.py at startup."""
    import jpdse_tpu.data.device_cache as dc

    cfg = train_cfg(n=2)
    loader = create_dataloader(cfg)

    def boom(self, dataset, cfg):
        raise ValueError("all input arrays must have the same shape")

    monkeypatch.setattr(dc.DeviceDatasetCache, "__init__", boom)
    assert dc.maybe_device_cache(loader, cfg) is None
    assert "not stackable" in capsys.readouterr().out


TINY = (
    "--dataset cityscapes --root_dir {root} --model pix2pixHD "
    "--no_label_encoding --no_feat_encoding --no_generator_binarization "
    "--preprocess_mode fixed --load_size 128 --crop_size 128 "
    "--val_preprocess_mode fixed --val_load_size 128 --val_crop_size 128 "
    "--ngf 8 --ndf 8 --n_downsample_global 2 --n_blocks_global 1 --num_D 2 "
    "--batch_size 2 --max_dataset_size 4 --no_vgg_loss --seed 0 --mode val "
    "--cache_images "
)


def run(args, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py")] + args.split(),
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_latest_interval_periodic_save(tmp_path):
    # --latest_interval saves an exact resume point even when best-val
    # gating never fires (no val at all here: val_interval 5 > num_epochs)
    save = tmp_path / "run"
    r = run(
        TINY.format(root=CITYSCAPES_ROOT)
        + f"--num_epochs 2 --val_interval 5 --latest_interval 2 "
        f"--save_dir {save}"
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert not (save / "params").exists()  # best-val never saved
    meta = json.loads((save / "latest" / "trainer_meta.json").read_text())
    assert meta["epoch"] == 1  # 0-indexed epoch 1 == end of 2nd epoch


def test_watchdog_chunked_resume(tmp_path):
    save = tmp_path / "run"
    # watchdog threshold far below any real process RSS -> exits 75 after
    # the first epoch with a latest-state checkpoint. val_interval 5 keeps
    # the best-val checkpoint from existing, so the resume must use latest.
    r = run(
        TINY.format(root=CITYSCAPES_ROOT)
        + f"--num_epochs 3 --val_interval 5 --save_dir {save} "
        f"--max_host_rss_gb 0.001"
    )
    assert r.returncode == 75, (r.stdout[-2000:], r.stderr[-2000:])
    assert (save / "latest" / "trainer_meta.json").exists()
    meta = json.loads((save / "latest" / "trainer_meta.json").read_text())
    first_stop = meta["epoch"]

    # wrapper-style restart: same save_dir as checkpoints_dir resumes from
    # latest (watchdog off now) and runs to completion
    r2 = run(
        TINY.format(root=CITYSCAPES_ROOT)
        + f"--num_epochs 2 --always_save --save_dir {save} "
        f"--load_model --checkpoints_dir {save}"
    )
    assert r2.returncode == 0, (r2.stdout[-2000:], r2.stderr[-2000:])
    assert "resuming from latest-state checkpoint" in r2.stdout
    assert f"starting from epoch {first_stop + 2}" in r2.stdout


def test_val_cache_builds_each_batch_once():
    """maybe_val_cache probes the loader for its per-batch size, then hands
    the probed batch + the SAME iterator to CachedValBatches — the first
    val batch must not be built twice (regression: the probe used to
    next(iter(loader)) and then re-iterate from scratch)."""
    from jpdse_tpu.data.device_cache import maybe_val_cache

    cfg = train_cfg()
    cfg.is_train = False
    loader = create_dataloader(cfg)
    ds = loader.dataset
    n_items = len(ds)
    calls = {"n": 0}
    orig = type(ds).__getitem__

    def counting(self, idx, *a, **k):
        calls["n"] += 1
        return orig(self, idx, *a, **k)

    type(ds).__getitem__ = counting
    try:
        cache = maybe_val_cache(loader, cfg)
    finally:
        type(ds).__getitem__ = orig
    assert cache is not None
    assert len(cache) == len(loader)
    assert calls["n"] == n_items, f"each val item must be built exactly once, got {calls['n']}"


def test_compact_storage_engages():
    """The cache stores uint8-sourced float images as uint8 + LUT and id
    maps at their narrowest exact width (round-5: what lets the 2048x1024
    hires cache fit HBM) — on top of the bit-identity the tests above pin."""
    cfg = train_cfg()
    cache = maybe_device_cache(create_dataloader(cfg), cfg)
    assert cache is not None
    assert cache.ds["image"].dtype == np.uint8 and "image" in cache.luts
    assert cache.luts["image"].shape == (256, 3)
    assert cache.ds["label"].dtype == np.uint8
    assert cache.ds["instance"].dtype == np.uint16
    f32_bytes = sum(
        np.prod(v.shape) * 4 for v in cache.ds.values()
    )
    assert cache.nbytes < 0.45 * f32_bytes  # ~4x smaller than fp32 storage
