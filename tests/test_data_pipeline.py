"""Data pipeline tests on the bundled 30-image Cityscapes val subset that
ships with the reference (read-only at /root/reference/datasets/...)."""

import os

import numpy as np
import pytest

from jpdse_tpu.codecs.bridge import available_codecs, compress_for_model, encode_decode
from jpdse_tpu.config import Config, apply_dataset_defaults, derive_eval_config
from jpdse_tpu.data import create_dataloader, find_dataset_using_name

CITYSCAPES_ROOT = "/root/reference/datasets/cityscapes_test_CVPR20_1024"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CITYSCAPES_ROOT), reason="bundled cityscapes subset not present"
)


def cityscapes_cfg(mode="val", crop=512) -> Config:
    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.data.root_dir = CITYSCAPES_ROOT
    cfg.mode = mode
    cfg.is_train = False
    cfg.data.preprocess.preprocess_mode = "fixed"
    cfg.data.preprocess.crop_size = crop
    cfg.data.preprocess.aspect_ratio = 2.0
    cfg.optim.seed = 0
    return cfg


def test_cityscapes_paths_and_pairing():
    cfg = cityscapes_cfg()
    ds = find_dataset_using_name("cityscapes")(cfg)
    assert len(ds) == 30
    for lp, ip, np_ in zip(ds.label_paths[:3], ds.image_paths[:3], ds.instance_paths[:3]):
        assert lp.endswith("_labelIds.png")
        assert np_.endswith("_instanceIds.png")
        assert ds.paths_match(lp, ip)


def test_cityscapes_sample_shapes_and_ranges():
    cfg = cityscapes_cfg(crop=512)
    ds = find_dataset_using_name("cityscapes")(cfg)
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert s["image"].shape == (256, 512, 3)  # crop / aspect_ratio = 256
    assert s["image"].dtype == np.float32
    # normalized with mean=std=0.5 -> [-1, 1]
    assert -1.01 <= s["image"].min() and s["image"].max() <= 1.01
    assert s["label"].shape == (256, 512)
    assert 0 <= s["label"].min() and s["label"].max() <= 35
    assert s["instance"].shape == (256, 512)
    assert s["instance"].dtype == np.int32
    assert s["instance"].max() >= 1000  # cityscapes encodes class*1000+idx


def test_loader_batching_and_determinism():
    cfg = cityscapes_cfg()
    cfg.data.batch_size = 2
    cfg.data.max_dataset_size = 6
    loader = create_dataloader(cfg)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["image"].shape == (2, 256, 512, 3)
    assert b["label"].shape == (2, 256, 512)
    assert len(b["path"]) == 2
    # eval loader: deterministic order, no shuffle
    loader2 = create_dataloader(cfg)
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(b["image"], b2["image"])


def test_train_augmentation_shared_params():
    """Crop + flip must be identical across image/label/instance."""
    cfg = cityscapes_cfg(mode="val")
    cfg.is_train = True
    cfg.data.preprocess.preprocess_mode = "scale_width_and_crop"
    cfg.data.preprocess.load_size = 1024
    cfg.data.preprocess.crop_size = 256
    ds = find_dataset_using_name("cityscapes")(cfg)
    s1 = ds.__getitem__(0, rng=np.random.default_rng(42))
    s2 = ds.__getitem__(0, rng=np.random.default_rng(42))
    np.testing.assert_array_equal(s1["label"], s2["label"])
    np.testing.assert_array_equal(s1["image"], s2["image"])
    assert s1["image"].shape == (256, 256, 3)
    # different key -> (almost surely) different crop
    s3 = ds.__getitem__(0, rng=np.random.default_rng(43))
    assert not np.array_equal(s1["image"], s3["image"])


def test_cache_images_identical_samples():
    """cache_images memoizes decode+resize but must leave the sample stream
    bit-identical (same seeded flips, same normalize) — and random-crop modes
    refuse the cache."""
    cfg = cityscapes_cfg(mode="val", crop=256)
    cfg.is_train = True  # exercise the flip path
    cfg.data.max_dataset_size = 2
    ds_plain = find_dataset_using_name("cityscapes")(cfg)

    import copy

    cfg_c = copy.deepcopy(cfg)
    cfg_c.data.cache_images = True
    ds_cached = find_dataset_using_name("cityscapes")(cfg_c)
    assert ds_cached._cache_enabled
    for idx in range(2):
        for seed in (0, 1, 2):
            a = ds_plain.__getitem__(idx, rng=np.random.default_rng(seed))
            b = ds_cached.__getitem__(idx, rng=np.random.default_rng(seed))
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["label"], b["label"])
            np.testing.assert_array_equal(a["instance"], b["instance"])
    assert len(ds_cached._cache) == 2
    # second pass hits the cache (decode skipped) and is still identical
    a = ds_plain.__getitem__(0, rng=np.random.default_rng(5))
    b = ds_cached.__getitem__(0, rng=np.random.default_rng(5))
    np.testing.assert_array_equal(a["image"], b["image"])

    cfg_rc = copy.deepcopy(cfg_c)
    cfg_rc.data.preprocess.preprocess_mode = "scale_width_and_crop"
    ds_rc = find_dataset_using_name("cityscapes")(cfg_rc)
    assert not ds_rc._cache_enabled  # random crop: cache refused


def test_codec_bridge_jpg_round_trip(rng):
    img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    dec, nbytes = encode_decode(img, "jpg", 90)
    arr = np.asarray(dec)
    assert arr.shape == (64, 96, 3)
    assert nbytes > 0
    # higher quality -> more bytes, lower error
    dec_lo, nbytes_lo = encode_decode(img, "jpg", 10)
    assert nbytes_lo < nbytes
    err_hi = np.abs(arr.astype(np.float32) - img).mean()
    err_lo = np.abs(np.asarray(dec_lo, np.float32) - img).mean()
    assert err_hi < err_lo


def test_codec_bridge_webp_and_j2k(rng):
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    for ext, q in [("webp", 80), ("j2k", 10)]:
        dec, nbytes = encode_decode(img, ext, q)
        assert np.asarray(dec).shape == (64, 64, 3)
        assert nbytes > 0


def test_compress_for_model_multi_quality(rng):
    img = (rng.random((32, 64, 3)) * 255).astype(np.uint8)
    out, nbytes = compress_for_model(img, "jpg", [90, 30], (0.5,) * 3, (0.5,) * 3)
    assert out.shape == (32, 64, 6)
    assert out.dtype == np.float32
    assert nbytes > 0


def test_use_compressed_pipeline():
    cfg = cityscapes_cfg()
    cfg.data.max_dataset_size = 1
    cfg.codec.use_compressed = True
    cfg.codec.ext = "jpg"
    cfg.codec.quality = (75,)
    loader = create_dataloader(cfg)
    b = next(iter(loader))
    assert b["compressed"].shape == (1, 256, 512, 3)
    assert b["base_codec_bytes"][0] > 0
    # compressed is close to the original but not identical
    diff = np.abs(b["compressed"] - b["image"]).mean()
    assert 0 < diff < 0.2


def test_available_codecs():
    av = available_codecs()
    assert {"jpg", "webp", "j2k"} <= set(av)


def test_multihost_rank_batches_equalized():
    """Every rank must produce the SAME number of train batches or the
    multi-host gradient psum deadlocks when short ranks finish early (e.g.
    30 samples on 4 hosts gave 4,4,3,3 batches before the wrap-padding)."""
    from jpdse_tpu.data.loader import DataLoader

    class _Stub:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

    for n, world, bs in [(30, 4, 2), (5, 2, 2), (7, 3, 1), (8, 8, 2)]:
        per_rank = []
        seen = set()
        for rank in range(world):
            dl = DataLoader(
                _Stub(n), batch_size=bs, shuffle=True, drop_last=True,
                seed=3, rank=rank, world=world,
            )
            batches = dl._index_batches()
            assert len(batches) == len(dl)
            per_rank.append(len(batches))
            seen.update(i for b in batches for i in b)
        assert len(set(per_rank)) == 1, (n, world, bs, per_rank)
        # wrap-padding duplicates a few samples but drops none (up to
        # drop_last's final partial batch)
        n_kept = per_rank[0] * bs * world
        assert len(seen) >= min(n, n_kept)
