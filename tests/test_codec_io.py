"""Deploy-time bitstream round trip: encoders -> .jpds pack -> unpack ->
decode_from_codes reconstructs EXACTLY what the full decode path produces
(the capability the reference lacked: its dumped codes were not decodable,
test.py:98-110)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jpdse_tpu import codec_io, native
from jpdse_tpu.trainer import Trainer

from tests.test_codec_model import tiny_batch, tiny_cfg

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native range coder unavailable"
)


def test_pack_unpack_round_trip(rng):
    codes = [
        (rng.random((1, 32, 64, 16)) < 0.3).astype(np.float32),
        (rng.random((1, 16, 32, 32)) < 0.7).astype(np.float32),
    ]
    data = codec_io.pack(codes, (64, 128))
    codes2, hw = codec_io.unpack(data)
    assert hw == (64, 128)
    for a, b in zip(codes, codes2):
        np.testing.assert_array_equal(a, b)
    # biased codes compress below 1 bit/bit
    n_bits = sum(c.size for c in codes)
    assert len(data) * 8 < n_bits


def test_compress_decompress_equals_direct_decode(rng):
    """trainer.compress -> .jpds -> trainer.decompress == trainer.get_img."""
    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.data.batch_size = 2
    batch = {k: np.asarray(v) for k, v in tiny_batch(rng).items()}
    tr = Trainer(cfg, "test", sample_batch=batch)

    streams = tr.compress(batch)
    assert len(streams) == 2
    direct = tr.get_img(batch)
    for j, stream in enumerate(streams):
        recon = tr.decompress(stream)
        np.testing.assert_allclose(recon, direct[j], atol=1e-5)

    # rate sanity: bitstream is real and bounded by the raw code size
    codes = tr.get_code(batch)
    raw_bits = codes.shape[1]
    for stream in streams:
        assert 0 < len(stream) * 8 < raw_bits * 1.1 + 4096


def test_generator_bottleneck_bitstream(rng):
    """The G-binarized configuration round-trips through the bitstream too."""
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_encoder_binarization=True,
        no_label_encoder_binarization=True,
    )
    cfg.data.batch_size = 2
    batch = {k: np.asarray(v) for k, v in tiny_batch(rng).items()}
    tr = Trainer(cfg, "test", sample_batch=batch)
    streams = tr.compress(batch)
    direct = tr.get_img(batch)
    recon = tr.decompress(streams[0])
    np.testing.assert_allclose(recon, direct[0], atol=1e-5)


class TestBitstreamRobustness:
    """Malformed .jpds inputs must fail with clear errors, not garbage."""

    def _valid(self):
        import numpy as np

        from jpdse_tpu import codec_io

        rng = np.random.default_rng(0)
        codes = [rng.integers(0, 2, (4, 8, 16)).astype(np.uint8)]
        return codec_io.pack([c for c in codes], (32, 64))

    def test_bad_magic(self):
        import pytest

        from jpdse_tpu import codec_io

        with pytest.raises(ValueError, match="magic"):
            codec_io.unpack(b"NOPE" + self._valid()[4:])

    def test_bad_version(self):
        import pytest

        from jpdse_tpu import codec_io

        data = bytearray(self._valid())
        data[4] = 99
        with pytest.raises(ValueError, match="version"):
            codec_io.unpack(bytes(data))

    def test_truncated_payload(self):
        import pytest

        from jpdse_tpu import codec_io

        data = self._valid()
        with pytest.raises(Exception):
            codec_io.unpack(data[: len(data) // 2])

    def test_round_trip_ref(self):
        import numpy as np

        from jpdse_tpu import codec_io

        rng = np.random.default_rng(1)
        codes = [
            rng.integers(0, 2, (4, 8, 16)).astype(np.uint8),
            rng.integers(0, 2, (2, 4, 8)).astype(np.uint8),
        ]
        data = codec_io.pack(list(codes), (32, 64))
        out, hw = codec_io.unpack(data)
        assert hw == (32, 64)
        for c, o in zip(codes, out):
            np.testing.assert_array_equal(o[0], c.astype(np.float32))
