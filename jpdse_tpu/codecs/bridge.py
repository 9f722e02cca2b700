"""Base-codec bridge: route images through an external codec (BPG / JPEG /
WebP / JPEG2000) and back, host-side.

Replaces Pix2PixHDModel.converter/compress (pix2pixHD_model.py:287-359),
fixing its two throughput sins:
  * jpg/webp/j2k run fully in-memory through PIL (BytesIO), no PNG round trip
    through the filesystem (:340-351);
  * bpg runs through the ``bpgenc``/``bpgdec`` binaries with direct argv spawn
    (no shell), unique tempfiles on a ramdisk, and a thread pool — instead of
    a blocking ``subprocess.run('bpgenc -q ...', shell=True)`` per image per
    step (:317-318). The temp-file-collision hazard documented at :331-333 is
    gone (names are per-call unique).

Returns both the decoded image and the bitstream byte count, so base-codec
bpp is measurable (the reference never tracked it).

Round 2 adds the SURVEY §7.3 design target: ``ext heif``, an **in-process
HEVC-intra codec** (jpdse_tpu/native/heif_codec.cpp: libheif + x265/de265
behind a C++ in-memory RGB<->bitstream API). BPG *is* HEVC intra coding, so
this is the flagship base-codec family with zero subprocess forks and zero
filesystem round trips; ``ext bpg`` additionally falls back to it (with a
one-time notice) when the bpgenc/bpgdec binaries are absent.
"""

from __future__ import annotations

import functools
import io
import os
import shutil
import subprocess
import tempfile
import uuid
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


class CodecUnavailable(RuntimeError):
    pass


_BPG_ENC = shutil.which("bpgenc")
_BPG_DEC = shutil.which("bpgdec")


def _ramdisk_dir() -> str:
    for base in ("/dev/shm", tempfile.gettempdir()):
        if os.path.isdir(base) and os.access(base, os.W_OK):
            return base
    return "."


@functools.lru_cache(maxsize=1)
def _heif_ok() -> bool:
    """Cached: the probe allocates a libheif context and queries the HEVC
    encoder/decoder — availability cannot change within a process, and this
    is called per image on the bpg-fallback path."""
    try:
        from jpdse_tpu import native

        return native.heif_available()
    except Exception:
        return False


def available_codecs() -> List[str]:
    codecs = ["jpg", "webp", "j2k"]
    try:
        from PIL import features as _pil_features

        if _pil_features.check("avif"):
            codecs.append("avif")
    except Exception:
        pass
    if _heif_ok():
        codecs.append("heif")
    if (_BPG_ENC and _BPG_DEC) or _heif_ok():
        codecs.append("bpg")
    return codecs


_bpg_fallback_warned = False


def _heif_round_trip(img: Image.Image, quality: int) -> Tuple[Image.Image, int]:
    from jpdse_tpu import native

    rgb = np.asarray(img, np.uint8)
    stream = native.heif_encode(rgb, quality=int(quality))
    dec = native.heif_decode(stream)
    return Image.fromarray(dec), len(stream)


def _pil_round_trip(img: Image.Image, fmt: str, save_kwargs: dict) -> Tuple[Image.Image, int]:
    buf = io.BytesIO()
    img.save(buf, format=fmt, **save_kwargs)
    nbytes = buf.tell()
    buf.seek(0)
    out = Image.open(buf)
    out.load()
    return out.convert("RGB"), nbytes


def encode_decode(
    img: "Image.Image | np.ndarray", ext: str, quality: int
) -> Tuple[Image.Image, int]:
    """One image through the base codec. Returns (decoded RGB PIL image,
    bitstream bytes). Quality scales follow the reference's converter
    (pix2pixHD_model.py:305-319): PIL quality for jpg/webp, rate for j2k,
    BPG quantizer for bpg."""
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB")
    if ext == "jpg":
        return _pil_round_trip(img, "JPEG", {"quality": int(quality)})
    if ext == "webp":
        return _pil_round_trip(img, "WEBP", {"quality": int(quality)})
    if ext == "avif":
        # AV1 intra via libavif (PIL plugin) — a modern base codec beyond the
        # reference's four; quality in [0, 100]
        return _pil_round_trip(img, "AVIF", {"quality": int(quality)})
    if ext == "j2k":
        return _pil_round_trip(
            img, "JPEG2000", {"quality_mode": "rates", "quality_layers": [quality]}
        )
    if ext == "heif":
        if not _heif_ok():
            raise CodecUnavailable(
                "in-process HEVC codec unavailable (libheif/x265/de265 not "
                "loadable) — use ext in {jpg, webp, j2k}"
            )
        return _heif_round_trip(img, quality)
    if ext == "bpg":
        if not (_BPG_ENC and _BPG_DEC):
            if _heif_ok():
                # BPG is HEVC intra; fall back to the in-process HEVC codec.
                # bpgenc -q is a quantizer in [0, 51] (lower = better); map it
                # monotonically onto libheif's [0, 100] quality (higher =
                # better): q_heif = 100 - 2 * q_bpg.
                global _bpg_fallback_warned
                if not _bpg_fallback_warned:
                    _bpg_fallback_warned = True
                    print(
                        "note: bpgenc/bpgdec binaries absent; using the "
                        "in-process HEVC-intra codec (ext heif) with "
                        "q_heif = 100 - 2*q_bpg"
                    )
                return _heif_round_trip(img, max(0, min(100, 100 - 2 * int(quality))))
            raise CodecUnavailable(
                "bpgenc/bpgdec not found on PATH — install libbpg or use "
                "ext in {jpg, webp, j2k, heif}"
            )
        d = _ramdisk_dir()
        stem = os.path.join(d, f"jpdse_{uuid.uuid4().hex}")
        png, bpg, out = stem + ".png", stem + ".bpg", stem + "_dec.png"
        try:
            img.save(png)
            subprocess.run(
                [_BPG_ENC, "-q", str(int(quality)), "-o", bpg, png],
                check=True,
                capture_output=True,
            )
            nbytes = os.path.getsize(bpg)
            subprocess.run(
                [_BPG_DEC, "-o", out, bpg], check=True, capture_output=True
            )
            decoded = Image.open(out).convert("RGB")
            decoded.load()
            return decoded, nbytes
        finally:
            for p in (png, bpg, out):
                if os.path.exists(p):
                    os.unlink(p)
    raise ValueError("format must be one of jpg, webp, j2k, avif, heif, or bpg")


_POOL: Optional[ThreadPoolExecutor] = None


def _pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(max_workers=min(16, (os.cpu_count() or 4)))
    return _POOL


def batch_encode_decode(
    imgs: Sequence["Image.Image | np.ndarray"], ext: str, quality: int
) -> List[Tuple[Image.Image, int]]:
    """Thread-pooled batch round trip (PIL and the codec binaries release the
    GIL / run out-of-process)."""
    return list(_pool().map(lambda im: encode_decode(im, ext, quality), imgs))


def compress_for_model(
    img_uint8: np.ndarray,
    ext: str,
    qualities: Sequence[int],
    mean,
    std,
) -> Tuple[np.ndarray, int]:
    """The model-facing path (compress, pix2pixHD_model.py:324-359): round-trip
    one uint8 HWC image at each quality factor, normalize to model space, and
    concatenate the per-quality outputs on the channel axis.

    Returns (float32 (H, W, 3*len(qualities)), total bitstream bytes).
    """
    outs, total = [], 0
    for q in qualities:
        dec, nbytes = encode_decode(img_uint8, ext, q)
        total += nbytes
        arr = np.asarray(dec, np.float32) / 255.0
        outs.append((arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32))
    return np.concatenate(outs, axis=-1), total
