"""Base-codec bridge round trips across every available ext, including the
round-2 additions (avif via PIL/libavif; heif = in-process HEVC intra; bpg
falling back to heif when the binaries are absent)."""

import numpy as np
import pytest

from jpdse_tpu.codecs import bridge


def _img(rng, h=64, w=128):
    x = np.linspace(0, 255, w)[None, :, None] + np.linspace(0, 50, h)[:, None, None]
    return np.clip(x + rng.normal(0, 6, (h, w, 3)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("ext", ["jpg", "webp", "j2k", "avif", "heif", "bpg"])
def test_round_trip_all_codecs(rng, ext):
    if ext not in bridge.available_codecs():
        pytest.skip(f"{ext} unavailable in this environment")
    img = _img(rng)
    quality = 33 if ext == "bpg" else (30 if ext == "j2k" else 60)
    dec, nbytes = bridge.encode_decode(img, ext, quality)
    arr = np.asarray(dec, np.uint8)
    assert arr.shape == img.shape
    assert 0 < nbytes < img.nbytes
    mse = np.mean((arr.astype(np.float64) - img.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    assert psnr > 22, (ext, psnr)


def test_compress_for_model_multi_quality(rng):
    img = _img(rng)
    out, total = bridge.compress_for_model(
        img, "jpg", [30, 70], (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    )
    assert out.shape == (64, 128, 6)
    assert total > 0
