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


_PIL_FMT = {"jpg": "JPEG", "webp": "WEBP", "avif": "AVIF", "j2k": "JPEG2000"}


def encode_bytes(
    img: "Image.Image | np.ndarray", ext: str, quality: int
) -> Tuple[bytes, str]:
    """Encode one RGB image to the base codec's bitstream. Returns
    (stream bytes, effective codec name) — 'bpg' without the binaries
    resolves to the in-process HEVC codec, so the effective name ('heif')
    is what a receiver must decode with. Quality scales follow the
    reference's converter (pix2pixHD_model.py:305-319)."""
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB")
    if ext in _PIL_FMT:
        kwargs = (
            {"quality_mode": "rates", "quality_layers": [quality]}
            if ext == "j2k"
            else {"quality": int(quality)}
        )
        buf = io.BytesIO()
        img.save(buf, format=_PIL_FMT[ext], **kwargs)
        return buf.getvalue(), ext
    if ext == "heif":
        if not _heif_ok():
            raise CodecUnavailable(
                "in-process HEVC codec unavailable (libheif/x265/de265 not "
                "loadable) — use ext in {jpg, webp, j2k}"
            )
        from jpdse_tpu import native

        return native.heif_encode(np.asarray(img, np.uint8), quality=int(quality)), "heif"
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
                return encode_bytes(img, "heif", max(0, min(100, 100 - 2 * int(quality))))
            raise CodecUnavailable(
                "bpgenc/bpgdec not found on PATH — install libbpg or use "
                "ext in {jpg, webp, j2k, heif}"
            )
        d = _ramdisk_dir()
        stem = os.path.join(d, f"jpdse_{uuid.uuid4().hex}")
        png, bpg = stem + ".png", stem + ".bpg"
        try:
            img.save(png)
            subprocess.run(
                [_BPG_ENC, "-q", str(int(quality)), "-o", bpg, png],
                check=True,
                capture_output=True,
            )
            with open(bpg, "rb") as f:
                return f.read(), "bpg"
        finally:
            for p in (png, bpg):
                if os.path.exists(p):
                    os.unlink(p)
    raise ValueError("format must be one of jpg, webp, j2k, avif, heif, or bpg")


def decode_bytes(stream: bytes, ext: str) -> np.ndarray:
    """Decode a base-codec bitstream (as produced by encode_bytes, with the
    *effective* codec name) to a uint8 RGB array."""
    if ext in _PIL_FMT:
        img = Image.open(io.BytesIO(stream))
        img.load()
        return np.asarray(img.convert("RGB"), np.uint8)
    if ext == "heif":
        from jpdse_tpu import native

        return native.heif_decode(stream)
    if ext == "bpg":
        if not _BPG_DEC:
            raise CodecUnavailable("bpgdec not found on PATH")
        d = _ramdisk_dir()
        stem = os.path.join(d, f"jpdse_{uuid.uuid4().hex}")
        bpg, out = stem + ".bpg", stem + "_dec.png"
        try:
            with open(bpg, "wb") as f:
                f.write(stream)
            subprocess.run(
                [_BPG_DEC, "-o", out, bpg], check=True, capture_output=True
            )
            decoded = Image.open(out).convert("RGB")
            decoded.load()
            return np.asarray(decoded, np.uint8)
        finally:
            for p in (bpg, out):
                if os.path.exists(p):
                    os.unlink(p)
    raise ValueError(f"unknown codec {ext}")


def encode_decode(
    img: "Image.Image | np.ndarray", ext: str, quality: int
) -> Tuple[Image.Image, int]:
    """One image through the base codec. Returns (decoded RGB PIL image,
    bitstream bytes)."""
    stream, eff = encode_bytes(img, ext, quality)
    return Image.fromarray(decode_bytes(stream, eff)), len(stream)


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
    return_streams: bool = False,
):
    """The model-facing path (compress, pix2pixHD_model.py:324-359): round-trip
    one uint8 HWC image at each quality factor, normalize to model space, and
    concatenate the per-quality outputs on the channel axis.

    Returns (float32 (H, W, 3*len(qualities)), total bitstream bytes); with
    ``return_streams`` also (streams list, effective codec name) so the exact
    bitstreams can be embedded in a .jpds file (codec_io.SideInfo)."""
    outs, streams, total = [], [], 0
    eff = ext
    for q in qualities:
        stream, eff = encode_bytes(img_uint8, ext, q)
        streams.append(stream)
        total += len(stream)
        arr = decode_bytes(stream, eff).astype(np.float32) / 255.0
        outs.append((arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32))
    cat = np.concatenate(outs, axis=-1)
    if return_streams:
        return cat, total, streams, eff
    return cat, total


def normalize_decoded(
    rgb_u8: np.ndarray, mean, std
) -> np.ndarray:
    """uint8 HWC -> model-space float32 (the normalization compress_for_model
    applies) — the deploy decoder uses this on decode_bytes output."""
    arr = rgb_u8.astype(np.float32) / 255.0
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
