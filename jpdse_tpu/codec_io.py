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

Version 2 appends the side-info sections that make the reference's *raw*
configurations deployable too (its flagship recipe rides raw one-hot
semantics + BPG-compressed visuals, scripts/pix2pixHD_bpg_train.sh:5-7, and
its test.py:98-110 dump was undecodable for them):

    [u8 flags]                    bit0 label blob, bit1 instance blob,
                                  bit2 base codec, bit3 label DERIVED from
                                  instance (Cityscapes id convention,
                                  verified exactly at encode — no label
                                  section; decoder reconstructs it)
    label:    [u32 len][blob]     lossless id-map container (magic-sniffed:
    instance: [u32 len][blob]     PNG, IDRC = context-modeled range coder
                                  from native/idmap_coder.cpp — ~2x smaller
                                  on real maps — or IDRX = the same coder
                                  conditioned on the label map decoded
                                  earlier from this stream; encoder picks
                                  the smallest)
    base:     [u8 ext_len][ext][u8 n_payloads] { [u32 len][bytes] } *
              the base codec's own bitstream(s), one per quality factor

Every byte a receiver needs is in the file; total file size / pixels IS the
rate. Version-1 files (no side info) remain readable.
"""

from __future__ import annotations

import dataclasses
import io
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from jpdse_tpu import native

MAGIC = b"JPDS"
VERSION = 1
VERSION2 = 2
# Version 3 (round 4): a [u8 coder_mode] byte follows the shape table —
# 1 = spatial contexts (native.entropy_encode_spatial: per (channel,
# left-bit, up-bit) adaptive models; measured 24% smaller than the
# per-channel contexts on every trained bottleneck stream, e.g. the
# flagship 128+128 codes 0.639 -> 0.488 bpp) — and the side-info flags
# byte is always present (possibly 0). pack() encodes both ways and picks
# the smaller, so v3 only appears when spatial wins; v1/v2 remain readable
# AND writable (a per-channel win still emits them).
VERSION3 = 3


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


def downsample_ids(arr: np.ndarray, factor: int) -> np.ndarray:
    """Nearest downsample of an (H, W) id map for reduced-rate semantics
    (codec.sem_downsample): keep every factor-th sample — the numpy twin of
    the jnp ops/semantics.degrade_ids downsample half."""
    if factor <= 1:
        return arr
    return np.ascontiguousarray(np.asarray(arr)[::factor, ::factor])


def upsample_ids(arr: np.ndarray, factor: int, hw: Tuple[int, int]) -> np.ndarray:
    """Nearest upsample back to ``hw`` — inverse layout of downsample_ids
    (repeat + crop handles non-divisible sizes)."""
    if factor <= 1:
        return arr
    up = np.repeat(np.repeat(np.asarray(arr), factor, axis=0), factor, axis=1)
    return np.ascontiguousarray(up[: hw[0], : hw[1]])


def _upsample_side_maps(side: "SideInfo", hw: Tuple[int, int]) -> None:
    """Restore full-resolution semantic maps on a parsed stream whose maps
    were shipped downsampled (codec.sem_downsample). The id-map containers
    are self-describing (their own h, w ride in the blob), so no extra
    header field is needed: a map smaller than the image is upsampled by
    its implied integer factor; full-size maps pass through untouched."""
    H, W = hw
    for name in ("label", "instance"):
        m = getattr(side, name)
        if m is None or m.shape == (H, W):
            continue
        h, w = m.shape
        f = max(1, round(H / h))
        # numpy ::f keeps ceil(H/f) rows — require the exact pair
        if (-(-H // f), -(-W // f)) != (h, w):
            raise ValueError(
                f".jpds {name} map is {m.shape}, which is not an integer "
                f"nearest-downsample of the {H}x{W} image"
            )
        setattr(side, name, upsample_ids(m, f, hw))


@dataclasses.dataclass
class SideInfo:
    """Everything in a .jpds file beyond the learned codes."""

    label: Optional[np.ndarray] = None      # (H, W) uint8 label ids
    instance: Optional[np.ndarray] = None   # (H, W) int32 instance ids
    base_ext: Optional[str] = None          # effective base-codec name
    base_payloads: Optional[List[bytes]] = None  # one per quality factor

    def empty(self) -> bool:
        return (
            self.label is None
            and self.instance is None
            and not self.base_payloads
        )


@dataclasses.dataclass
class Bitstream:
    codes: List[np.ndarray]                 # (1, h, w, c) float32 {0,1}
    image_hw: Tuple[int, int]
    side: SideInfo


def encode_idmap_png(arr: np.ndarray) -> bytes:
    """Lossless PNG of an id map. uint8 maps save as mode 'L'; wider ids as
    16-bit grayscale ('I;16') — Cityscapes instance ids (class*1000+idx,
    max ~34xxx) fit in uint16."""
    from PIL import Image

    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        if arr.min() < 0 or arr.max() > 0xFFFF:
            raise ValueError(f"id map out of uint16 range [{arr.min()}, {arr.max()}]")
        # pick the narrowest lossless width — callers pass raw int maps
        # (pre-casting to uint8 would silently wrap ids > 255 and bypass
        # this guard, e.g. >255-class label sets)
        arr = arr.astype(np.uint8 if arr.max() <= 0xFF else np.uint16)
    if arr.dtype == np.uint8:
        img = Image.fromarray(arr, mode="L")
    else:
        img = Image.fromarray(arr, mode="I;16")
    buf = io.BytesIO()
    img.save(buf, format="PNG", optimize=True)
    return buf.getvalue()


def decode_idmap_png(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)))


IDRC_MAGIC = b"IDRC"
IDRX_MAGIC = b"IDRX"  # conditionally-coded: needs the cond map to decode


def encode_idmap(arr: np.ndarray, cond: Optional[np.ndarray] = None) -> bytes:
    """Losslessly encode an id map into a self-describing container: the
    context-modeled range coder (native/idmap_coder.cpp; ~2x smaller than
    optimized PNG on piecewise-constant semantic/instance maps, measured in
    tests/test_native.py) when the native lib is available and wins, else
    PNG. Container is distinguished by leading magic — PNG's \\x89PNG vs
    ``IDRC`` + u32 h + u32 w + range-coder payload.

    With ``cond`` (a same-shape map the decoder already has — pack() passes
    the label map when coding the instance map), the coder conditions each
    neighbor-match bit on cond-map agreement across that edge (~3-5x smaller
    instance streams; boundaries nearly coincide). Such streams carry the
    ``IDRX`` magic and require the same cond at decode; the encoder still
    picks whichever container is smallest, so callers may always pass cond
    when they'll have it at decode time."""
    arr = np.asarray(arr)
    png = encode_idmap_png(arr)
    best = png
    if native.available() and arr.ndim == 2:
        # RuntimeError = coder overflow (native.idmap_encode's worst-case
        # output cap, reachable only on near-random 32-bit maps, never on
        # real id maps) — such a map simply ships as PNG instead
        # the two encodes overflow independently (separate try blocks): an
        # unconditional-coder overflow must not skip the conditional attempt,
        # which is typically 3-5x smaller and may well fit the cap
        try:
            rc = native.idmap_encode(arr.astype(np.int32))
            blob = IDRC_MAGIC + struct.pack("<II", *arr.shape) + rc
            if len(blob) < len(best):
                best = blob
        except RuntimeError:
            pass
        if cond is not None:
            try:
                rcx = native.idmap_encode(
                    arr.astype(np.int32), cond=np.asarray(cond).astype(np.int32)
                )
                blobx = IDRX_MAGIC + struct.pack("<II", *arr.shape) + rcx
                if len(blobx) < len(best):
                    best = blobx
            except RuntimeError:
                pass
    return best


def decode_idmap(data: bytes, cond: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode either encode_idmap container (magic-sniffed) to int32. IDRX
    streams were coded conditionally and need the same ``cond`` map."""
    if data[:4] == IDRX_MAGIC:
        if cond is None:
            raise ValueError(
                "conditionally-coded id map (IDRX) needs its cond map "
                "(the label map decoded from the same stream)"
            )
        h, w = struct.unpack_from("<II", data, 4)
        return native.idmap_decode(
            data[12:], h, w, cond=np.asarray(cond).astype(np.int32)
        )
    if data[:4] == IDRC_MAGIC:
        h, w = struct.unpack_from("<II", data, 4)
        return native.idmap_decode(data[12:], h, w)
    return decode_idmap_png(data).astype(np.int32)


def derive_label_from_instance(inst: np.ndarray) -> np.ndarray:
    """The standard Cityscapes id convention: instance ids of 'thing'
    classes are label*1000+index, 'stuff' pixels carry the label id itself —
    so the label map is label = inst >= 1000 ? inst // 1000 : inst. pack()
    verifies this EXACTLY per image before relying on it (flag bit 3), so
    datasets with any other convention simply fall back to coding both
    maps; decode is lossless either way."""
    inst = np.asarray(inst).astype(np.int32)
    return np.where(inst >= 1000, inst // 1000, inst).astype(np.int32)


def sem_side_blobs(
    label: Optional[np.ndarray], instance: Optional[np.ndarray]
) -> Tuple[Optional[bytes], Optional[bytes], bool]:
    """The semantic side-info sections exactly as pack() writes them:
    (label_blob, instance_blob, label_derived). When the label map is
    exactly derivable from the instance map (Cityscapes id convention,
    verified per image) the label section is dropped entirely — one
    unconditionally-coded instance map is smaller than label +
    label-conditioned instance (measured 0.060 vs 0.091 bpp on the bundled
    1024x512 maps). Otherwise the instance map is coded conditionally on
    the label map that rides the same stream. The eval harness uses this
    same helper so reported rate matches deployed bytes."""
    derived = (
        label is not None
        and instance is not None
        and np.array_equal(
            derive_label_from_instance(instance),
            np.asarray(label).astype(np.int32),
        )
    )
    label_blob = None
    if label is not None and not derived:
        label_blob = encode_idmap(np.asarray(label))
    inst_blob = None
    if instance is not None:
        cond = None if (label is None or derived) else label
        inst_blob = encode_idmap(np.asarray(instance), cond=cond)
    return label_blob, inst_blob, derived


def side_requirements(cfg) -> Tuple[bool, bool, bool]:
    """Which side-info sections a configuration needs for a complete
    decodable bitstream: (need_label, need_instance, need_base). Raises for
    configurations whose visuals are raw *uncompressed* pixels (no bitstream
    representation exists)."""
    m = cfg.model
    if not m.no_generator_binarization:
        # the generator bottleneck code captures everything upstream of it
        return False, False, False
    sem_in_codes = cfg.use_netE4label and not m.no_label_encoder_binarization
    vis_in_codes = (
        (not m.no_feat) and cfg.use_netE and not m.no_encoder_binarization
    )
    vis_raw = (not m.no_feat) and not vis_in_codes
    if m.sem_masking:
        need_label = vis_raw  # label only shapes the semantic mask
    else:
        need_label = (not m.no_label) and not sem_in_codes
    need_inst = (not m.no_instance) and need_label
    if vis_raw and m.inst_wise_pool and cfg.use_netE:
        need_inst = True  # unbinarized encoder pools over instance ids
    need_base = vis_raw and cfg.codec.use_compressed
    if vis_raw and not cfg.codec.use_compressed:
        raise ValueError(
            "this configuration feeds raw uncompressed pixels to the "
            "generator (no_feat_encoding without use_compressed) — there "
            "is no bitstream representation for it"
        )
    return need_label, need_inst, need_base


def pack(
    codes: List[np.ndarray],
    image_hw: Tuple[int, int],
    side: Optional[SideInfo] = None,
) -> bytes:
    """codes: per-module (h, w, c) {0,1} arrays for ONE image. With ``side``,
    writes a version-2 stream embedding the label/instance maps and/or the
    base codec's payload; otherwise a version-1 stream."""
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
    coder_mode = 0
    if flats:
        bits = np.concatenate(flats)
        payload = native.entropy_encode(bits, contexts=_contexts_for(shapes))
        # spatial (channel x left-bit x up-bit) contexts: measured ~24%
        # smaller on trained bottleneck codes; keep whichever wins per image.
        # The comparison charges the v3 container overhead to the spatial
        # side: +1 coder_mode byte always, +1 forced flags byte when there is
        # no side info (v1 carries neither) — so a near-tie never emits a v3
        # stream larger than its v1/v2 encoding.
        spatial = native.entropy_encode_spatial(bits, shapes)
        v3_overhead = 1 + (0 if (side is not None and not side.empty()) else 1)
        if len(spatial) + v3_overhead < len(payload):
            coder_mode, payload = 1, spatial
    else:
        payload = b""  # side-info-only stream (e.g. the raw phase-2 config)

    v2 = side is not None and not side.empty()
    v3 = coder_mode != 0
    version = VERSION3 if v3 else (VERSION2 if v2 else VERSION)
    out = bytearray()
    out += MAGIC
    out += struct.pack("<BHH", version, image_hw[0], image_hw[1])
    out += struct.pack("<B", len(shapes))
    for h, w, c in shapes:
        out += struct.pack("<HHH", h, w, c)
    if v3:
        out += struct.pack("<B", coder_mode)
    out += struct.pack("<I", len(payload))
    out += payload
    if v3:
        v2 = True  # v3 always carries the flags byte (0 when no side info)
        side = side or SideInfo()
    if v2:
        # label/instance sections: derivation-aware + conditionally coded
        # (sem_side_blobs) — the label section vanishes when the instance
        # map implies it, else the instance rides conditioned on the label
        # decoded earlier from this same stream
        label_blob, inst_blob, derived = sem_side_blobs(side.label, side.instance)
        flags = (
            (1 if label_blob is not None else 0)
            | (2 if inst_blob is not None else 0)
            | (4 if side.base_payloads else 0)
            | (8 if derived else 0)
        )
        out += struct.pack("<B", flags)
        if label_blob is not None:
            out += struct.pack("<I", len(label_blob)) + label_blob
        if inst_blob is not None:
            out += struct.pack("<I", len(inst_blob)) + inst_blob
        if side.base_payloads:
            ext = (side.base_ext or "").encode("ascii")
            if not ext:
                raise ValueError("base payloads require base_ext")
            out += struct.pack("<B", len(ext)) + ext
            out += struct.pack("<B", len(side.base_payloads))
            for p in side.base_payloads:
                out += struct.pack("<I", len(p)) + p
    return bytes(out)


def unpack_full(data: bytes) -> Bitstream:
    """Parse a version-1 or version-2 stream into codes + side info."""
    if data[:4] != MAGIC:
        raise ValueError("not a .jpds bitstream (bad magic)")
    ver, H, W = struct.unpack_from("<BHH", data, 4)
    if ver not in (VERSION, VERSION2, VERSION3):
        raise ValueError(f"unsupported .jpds version {ver}")
    off = 9
    (n_codes,) = struct.unpack_from("<B", data, off)
    off += 1
    shapes = []
    for _ in range(n_codes):
        shapes.append(struct.unpack_from("<HHH", data, off))
        off += 6
    coder_mode = 0
    if ver == VERSION3:
        (coder_mode,) = struct.unpack_from("<B", data, off)
        off += 1
        if coder_mode not in (0, 1):
            raise ValueError(f"unknown .jpds coder mode {coder_mode}")
    (payload_bytes,) = struct.unpack_from("<I", data, off)
    off += 4
    payload = data[off : off + payload_bytes]
    if len(payload) != payload_bytes:
        raise ValueError(
            f"truncated .jpds: payload declares {payload_bytes} bytes, "
            f"{len(payload)} present"
        )
    off += payload_bytes
    n_bits = sum(h * w * c for h, w, c in shapes)
    if n_bits and coder_mode == 1:
        bits = native.entropy_decode_spatial(payload, shapes)
    elif n_bits:
        bits = native.entropy_decode(payload, n_bits, contexts=_contexts_for(shapes))
    else:
        bits = np.zeros(0, np.uint8)
    codes, pos = [], 0
    for h, w, c in shapes:
        n = h * w * c
        codes.append(bits[pos : pos + n].reshape(1, h, w, c).astype(np.float32))
        pos += n

    side = SideInfo()
    if ver in (VERSION2, VERSION3):
        def take(n):
            nonlocal off
            chunk = data[off : off + n]
            if len(chunk) != n:
                raise ValueError("truncated .jpds side-info section")
            off += n
            return chunk

        (flags,) = struct.unpack("<B", take(1))
        if flags & 1:
            (n,) = struct.unpack("<I", take(4))
            # int32 regardless of the container's storage width
            side.label = decode_idmap(take(n))
        if flags & 2:
            (n,) = struct.unpack("<I", take(4))
            side.instance = decode_idmap(take(n), cond=side.label)
        if flags & 8:
            # label section was dropped at encode because the instance map
            # implies it (verified exactly there)
            if side.instance is None:
                raise ValueError(
                    ".jpds side-info flags inconsistent: derived-label flag "
                    "(bit 3) set without an instance section (bit 2)"
                )
            side.label = derive_label_from_instance(side.instance)
        if flags & 4:
            (n_ext,) = struct.unpack("<B", take(1))
            side.base_ext = take(n_ext).decode("ascii")
            (n_pay,) = struct.unpack("<B", take(1))
            side.base_payloads = []
            for _ in range(n_pay):
                (n,) = struct.unpack("<I", take(4))
                side.base_payloads.append(take(n))
        # reduced-rate semantics (codec.sem_downsample): maps shipped small
        # come back to full resolution with the same nearest kernel training
        # used (ops/semantics.degrade_ids), so the decoder's inputs match
        _upsample_side_maps(side, (H, W))
    return Bitstream(codes=codes, image_hw=(H, W), side=side)


def unpack(data: bytes) -> Tuple[List[np.ndarray], Tuple[int, int]]:
    """Returns (codes [(1, h, w, c) float32 {0,1}], (H, W)). Side info, if
    present, is parsed and discarded — use unpack_full for deploy decode."""
    bs = unpack_full(data)
    return bs.codes, bs.image_hw
