"""Reduced-rate semantics (codec.sem_downsample) — round-5 VERDICT item 6:
the round-4 ablation showed the semantics mechanism is real at equal input
but overpriced at 0.060 bpp; this mode ships the maps at 1/f resolution.
Pins: the jnp/numpy degrade kernels agree, prepare_inputs degradation equals
feeding pre-degraded maps, the .jpds container round-trips small maps back
to the training-matched full-res view, and the side-info rate drops."""

import numpy as np
import jax.numpy as jnp
import pytest

from jpdse_tpu import codec_io
from jpdse_tpu.cli import parse_config
from jpdse_tpu.models.codec import prepare_inputs
from jpdse_tpu.ops.semantics import degrade_ids


def _cfg(sem_downsample=1, extra=()):
    base = [
        "--dataset", "cityscapes", "--root_dir", "/tmp",
        "--no_label_encoding", "--no_feat_encoding",
        "--no_generator_binarization", "--use_compressed",
        "--sem_downsample", str(sem_downsample),
    ]
    return parse_config(base + list(extra))


def test_degrade_ids_matches_numpy_down_up():
    rng = np.random.default_rng(0)
    for h, w, f in ((16, 24, 2), (16, 24, 4), (10, 14, 4), (9, 13, 2)):
        m = rng.integers(0, 35, (2, h, w), dtype=np.int32)
        got = np.asarray(degrade_ids(jnp.asarray(m), f))
        small = m[:, ::f, ::f]
        want = np.repeat(np.repeat(small, f, axis=1), f, axis=2)[:, :h, :w]
        np.testing.assert_array_equal(got, want)
        # channel-last layout passes through
        got4 = np.asarray(degrade_ids(jnp.asarray(m[..., None]), f))
        np.testing.assert_array_equal(got4[..., 0], want)
    # f=1 and None are no-ops
    assert degrade_ids(None, 2) is None
    m = rng.integers(0, 5, (1, 8, 8))
    np.testing.assert_array_equal(np.asarray(degrade_ids(jnp.asarray(m), 1)), m)


def test_numpy_down_up_roundtrip_matches_jnp():
    rng = np.random.default_rng(1)
    for h, w, f in ((32, 48, 2), (18, 26, 4)):
        m = rng.integers(0, 1000, (h, w), dtype=np.int32)
        small = codec_io.downsample_ids(m, f)
        assert small.shape == (-(-h // f), -(-w // f))
        up = codec_io.upsample_ids(small, f, (h, w))
        want = np.asarray(degrade_ids(jnp.asarray(m[None]), f))[0]
        np.testing.assert_array_equal(up, want)


def test_prepare_inputs_degrades_like_pre_degraded_maps():
    cfg2 = _cfg(2)
    cfg1 = _cfg(1)
    rng = np.random.default_rng(2)
    label = jnp.asarray(rng.integers(0, 35, (1, 16, 32)).astype(np.float32))
    inst = jnp.asarray(rng.integers(0, 9, (1, 16, 32)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(1, 16, 32, 3)).astype(np.float32))
    out2 = prepare_inputs(cfg2, label, inst, img, img)
    out1 = prepare_inputs(
        cfg1, degrade_ids(label, 2), degrade_ids(inst, 2), img, img
    )
    np.testing.assert_array_equal(
        np.asarray(out2["input_label"]), np.asarray(out1["input_label"])
    )
    np.testing.assert_array_equal(
        np.asarray(out2["instance_ids"]), np.asarray(degrade_ids(inst, 2))
    )


def test_jpds_roundtrip_upsamples_small_maps():
    rng = np.random.default_rng(3)
    h, w = 64, 96
    # blocky maps like real semantics (so the coder sees realistic input)
    lab = np.repeat(np.repeat(rng.integers(0, 8, (8, 12)), 8, 0), 8, 1).astype(
        np.int32
    )
    inst = (lab * 1000 + rng.integers(0, 3, (h, w))).astype(np.int32)
    for f in (2, 4):
        side = codec_io.SideInfo(
            label=codec_io.downsample_ids(lab, f),
            instance=codec_io.downsample_ids(inst, f),
        )
        data = codec_io.pack([], (h, w), side)
        bs = codec_io.unpack_full(data)
        want_lab = np.asarray(degrade_ids(jnp.asarray(lab[None]), f))[0]
        want_inst = np.asarray(degrade_ids(jnp.asarray(inst[None]), f))[0]
        np.testing.assert_array_equal(bs.side.label, want_lab)
        np.testing.assert_array_equal(bs.side.instance, want_inst)
    # full-res maps still pass through untouched
    side = codec_io.SideInfo(label=lab.copy(), instance=inst.copy())
    bs = codec_io.unpack_full(codec_io.pack([], (h, w), side))
    np.testing.assert_array_equal(bs.side.label, lab)
    np.testing.assert_array_equal(bs.side.instance, inst)


def test_jpds_rejects_non_integer_downsample():
    lab = np.zeros((30, 40), np.int32)  # not ceil(64/f) x ceil(96/f) for any f
    data = codec_io.pack([], (64, 96), codec_io.SideInfo(label=lab))
    with pytest.raises(ValueError, match="nearest-downsample"):
        codec_io.unpack_full(data)


def test_side_rate_drops_with_factor():
    rng = np.random.default_rng(4)
    lab = np.repeat(np.repeat(rng.integers(0, 8, (16, 24)), 8, 0), 8, 1).astype(
        np.int32
    )
    sizes = []
    for f in (1, 2, 4):
        blob = codec_io.encode_idmap(codec_io.downsample_ids(lab, f))
        sizes.append(len(blob))
    assert sizes[0] > sizes[1] > sizes[2]


def test_validate_rejects_bad_factor():
    with pytest.raises(ValueError, match="sem_downsample"):
        _cfg(3).validate()
    _cfg(2).validate()
