"""The .jpds bitstream format: a real, decodable compressed-image file.

The reference's test.py dumped one raw byte per code bit and only *estimated*
rate (test.py:98-110, pix2pixHD_model.py:480-489) — it never produced a
bitstream that could be decoded back. Here the deploy path is first-class:

    [magic 'JPDS'][u8 version][u16 H][u16 W]          image size (fine)
    [u8 n_codes] { [u16 h][u16 w][u16 c] } * n_codes  per-code shapes
    [u32 payload_bytes][payload]                      range-coded bits

The payload is the concatenation of every code's bits (NHWC order per code),
entropy-coded by the native adaptive binary range coder with per-channel
contexts (jpdse_tpu/native/range_coder.cpp). Contexts are derived from the
header shapes, so the decoder needs no side info beyond this file and the
model checkpoint.
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

import numpy as np

from jpdse_tpu import native

MAGIC = b"JPDS"
VERSION = 1


def contexts_for_shapes(shapes: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    """Per-bit context ids for the range coder's per-channel adaptive models:
    context = channel index within its code, offset so different codes never
    share a context. THE single definition — the .jpds encoder/decoder and
    the eval harness's .rc streams must all derive contexts identically or
    the adaptive models desynchronize."""
    ctxs, offset = [], 0
    for h, w, c in shapes:
        ctxs.append(np.tile(np.arange(c, dtype=np.int32), h * w) + offset)
        offset += c
    return np.concatenate(ctxs) if ctxs else np.zeros(0, np.int32)


_contexts_for = contexts_for_shapes


def pack(codes: List[np.ndarray], image_hw: Tuple[int, int]) -> bytes:
    """codes: per-module (h, w, c) {0,1} arrays for ONE image."""
    shapes = []
    flats = []
    for c in codes:
        c = np.asarray(c)
        if c.ndim == 4:
            if c.shape[0] != 1:
                raise ValueError("pack() takes one image at a time")
            c = c[0]
        shapes.append(tuple(int(s) for s in c.shape))
        flats.append(c.reshape(-1).astype(np.uint8))
    bits = np.concatenate(flats) if flats else np.zeros(0, np.uint8)
    payload = native.entropy_encode(bits, contexts=_contexts_for(shapes))

    out = bytearray()
    out += MAGIC
    out += struct.pack("<BHH", VERSION, image_hw[0], image_hw[1])
    out += struct.pack("<B", len(shapes))
    for h, w, c in shapes:
        out += struct.pack("<HHH", h, w, c)
    out += struct.pack("<I", len(payload))
    out += payload
    return bytes(out)


def unpack(data: bytes) -> Tuple[List[np.ndarray], Tuple[int, int]]:
    """Returns (codes [(1, h, w, c) float32 {0,1}], (H, W))."""
    if data[:4] != MAGIC:
        raise ValueError("not a .jpds bitstream (bad magic)")
    ver, H, W = struct.unpack_from("<BHH", data, 4)
    if ver != VERSION:
        raise ValueError(f"unsupported .jpds version {ver}")
    off = 9
    (n_codes,) = struct.unpack_from("<B", data, off)
    off += 1
    shapes = []
    for _ in range(n_codes):
        shapes.append(struct.unpack_from("<HHH", data, off))
        off += 6
    (payload_bytes,) = struct.unpack_from("<I", data, off)
    off += 4
    payload = data[off : off + payload_bytes]
    if len(payload) != payload_bytes:
        raise ValueError(
            f"truncated .jpds: payload declares {payload_bytes} bytes, "
            f"{len(payload)} present"
        )
    n_bits = sum(h * w * c for h, w, c in shapes)
    bits = native.entropy_decode(payload, n_bits, contexts=_contexts_for(shapes))
    codes, pos = [], 0
    for h, w, c in shapes:
        n = h * w * c
        codes.append(bits[pos : pos + n].reshape(1, h, w, c).astype(np.float32))
        pos += n
    return codes, (H, W)
