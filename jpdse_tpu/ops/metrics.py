"""Distortion / rate metrics in JAX (NHWC).

Implements the reference's evaluation protocol: L1 / MSE / MS-SSIM on
denormalized, uint8-quantized images (test.py:114-125) plus PSNR (derived from
MSE), and the Shannon-estimate + actual bpp of binary codes
(pix2pixHD_model.py:468-492).

MS-SSIM follows the exact package the reference depends on —
jorge-pessoa/pytorch-msssim (README.md:23, test.py:13,51): 11x11 gaussian
window (sigma 1.5) applied with **VALID padding (padding=0)**, 5 levels with
the standard Wang et al. weights, 2x2 avg-pool (floor) downsampling, and
output = prod(cs[:-1]^w[:-1]) * ssim_last^w[-1]. Pinned by a from-spec NumPy
golden in tests/test_metrics.py. Deviations, both only where that library
would crash or NaN: (a) levels whose spatial extent is smaller than the
window fall back to zero padding; (b) negative cs terms are relu-clamped
before the weighted product.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a - b) ** 2)


def psnr(a: jax.Array, b: jax.Array, data_range: float = 255.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB."""
    m = mse(a.astype(jnp.float32), b.astype(jnp.float32))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))


def denormalize_to_uint8(x: jax.Array, mean, std) -> jax.Array:
    """Normalized NHWC float -> uint8-quantized float in [0, 255].

    Matches tensor2im (ctu/utils/misc.py:64-95): denormalize, x255, clip,
    truncate-to-int (astype(uint8) truncates — kept for metric parity).
    """
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    y = (x.astype(jnp.float32) * std + mean) * 255.0
    y = jnp.clip(y, 0.0, 255.0)
    return jnp.floor(y)


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(img: jax.Array, size: int, sigma: float) -> jax.Array:
    """Depthwise separable gaussian blur, NHWC. VALID padding (the reference
    metric library convolves with padding=0); zero-pad fallback only when the
    input is smaller than the window (where valid conv is undefined).

    Precision is pinned to HIGHEST: a METRIC must not inherit the backend's
    default conv precision (bf16-class on TPU, and observed ~8e-4 relative
    under this environment's CPU path too) — the E[x^2]-E[x]^2 variance
    form amplifies that rounding into sign-flipped variances on
    low-contrast windows, blowing up the SSIM ratio wherever
    sig_a+sig_b crosses -c2 (measured: single map pixels at ~1e6 and image
    scores of 4.6 or 0.0). HIGHEST restores true fp32 accumulation
    (~4e-8 error), three orders below c2."""
    w = jnp.asarray(_gaussian_window(size, sigma))
    c = img.shape[-1]
    kh = jnp.tile(w.reshape(size, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1 (depthwise)
    kw = jnp.tile(w.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    pad = 0 if min(img.shape[1], img.shape[2]) >= size else size // 2
    out = jax.lax.conv_general_dilated(
        img, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    return out


def ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 255.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> Tuple[jax.Array, jax.Array]:
    """Mean SSIM and contrast-structure (cs) term over an NHWC batch.

    Inputs are normalized to [0, 1] internally: the E[x^2]-E[x]^2 variance
    form cancels catastrophically in fp32 at the 255 scale (E[x^2] ~ 65025
    carries ~+-1e2 of conv rounding noise, enough to drive a saturated flat
    region's sig_a+sig_b through -c2 and blow single ssim-map pixels up to
    ~1e5 — observed on a blown-out white sky, where it flipped a 0.95
    MS-SSIM image to 0.0). At the [0,1] scale the same relative noise is
    ~1e-7 against c2=9e-4, three orders of magnitude below significance."""
    scale = 1.0 / data_range
    a = a.astype(jnp.float32) * scale
    b = b.astype(jnp.float32) * scale
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    blur = functools.partial(_gaussian_filter, size=window_size, sigma=sigma)
    mu_a, mu_b = blur(a), blur(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = blur(a * a) - mu_a2
    sig_b = blur(b * b) - mu_b2
    sig_ab = blur(a * b) - mu_ab
    cs_map = (2.0 * sig_ab + c2) / (sig_a + sig_b + c2)
    ssim_map = ((2.0 * mu_ab + c1) / (mu_a2 + mu_b2 + c1)) * cs_map
    return jnp.mean(ssim_map), jnp.mean(cs_map)


def _avg_pool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ms_ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 255.0,
    window_size: int = 11,
    sigma: float = 1.5,
    weights: Tuple[float, ...] = MSSSIM_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM (5 levels). Inputs NHWC, any float/int dtype."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    levels = len(weights)
    mcs = []
    ssim_val = None
    for i in range(levels):
        ssim_val, cs = ssim(a, b, data_range, window_size, sigma)
        mcs.append(cs)
        if i < levels - 1:
            a, b = _avg_pool2(a), _avg_pool2(b)
    w = jnp.asarray(weights)
    # jnp.power on possibly-negative cs is guarded by relu (standard practice)
    mcs_arr = jnp.maximum(jnp.stack(mcs[:-1]), 0.0)
    ssim_last = jnp.maximum(ssim_val, 0.0)
    return jnp.prod(mcs_arr ** w[:-1]) * ssim_last ** w[-1]


def bernoulli_shannon_bpp(
    code: jax.Array, num_pixels: int, natural_log: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """(shannon_bpp, actual_bpp) of a flat {0,1} code for one image.

    Protocol from pix2pixHD_model.py:480-489: p = mean(code), per-bit entropy,
    scaled by code length / pixel count. NOTE the reference uses torch.log
    (natural log) — i.e. it reports nats/pixel under the name "bpp". We default
    to log2 (true bits); pass natural_log=True for bug-compatible numbers.
    """
    code = code.reshape(-1).astype(jnp.float32)
    # 1e-6 keeps (1-p) representable in float32 (1 - 1e-9 rounds to 1.0)
    p = jnp.clip(jnp.mean(code), 1e-6, 1.0 - 1e-6)
    if natural_log:
        ent = -p * jnp.log(p) - (1 - p) * jnp.log(1 - p)
    else:
        ent = -p * jnp.log2(p) - (1 - p) * jnp.log2(1 - p)
    n_bits = code.shape[0]
    return ent * n_bits / num_pixels, jnp.asarray(n_bits / num_pixels, jnp.float32)
