"""FastCodec (space-to-depth inference path) equivalence with the standard
SemanticCodec decode, in f32 on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.models.codec import SemanticCodec, prepare_inputs
from jpdse_tpu.models.fast_codec import FastCodec

from tests.test_codec_model import init_codec, tiny_batch, tiny_cfg


def test_fast_decode_matches_reference_path(rng):
    """Learned codec (binarized label + visual encoders)."""
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    want, _ = codec.apply({"params": params}, inputs, method=SemanticCodec.decode)

    fast = FastCodec(cfg, params, dtype=jnp.float32)
    got = fast.decode(batch)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fast_codes_match(rng):
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    want = codec.apply({"params": params}, inputs, method=SemanticCodec.get_codes)
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    got = fast.get_codes(batch)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        # codes are signs; allow disagreement only where tanh is ~0
        agree = np.mean(np.asarray(g) == np.asarray(w))
        assert agree > 0.999, agree


def test_fast_decode_generator_binarized(rng):
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=False,
        bin_generator_before_res=True,
    )
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    want, _ = codec.apply({"params": params}, inputs, method=SemanticCodec.decode)
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    got = fast.decode(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fast_decode_flagship_bpg_style(rng):
    """Raw semantics + compressed visuals straight into G (no encoders)."""
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
    )
    cfg.codec.use_compressed = True
    batch = tiny_batch(rng)
    batch["compressed"] = batch["image"] + 0.01
    codec = SemanticCodec(cfg)
    inputs = prepare_inputs(
        cfg, batch["label"], batch["instance"], batch["image"], batch["compressed"]
    )
    variables = codec.init({"params": jax.random.PRNGKey(0)}, inputs, method=SemanticCodec.decode)
    want, _ = codec.apply(variables, inputs, method=SemanticCodec.decode)
    fast = FastCodec(cfg, variables["params"], dtype=jnp.float32)
    got = fast.decode(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fast_decode_env_variants(rng, monkeypatch):
    """The env-gated layouts (head tap-folds ON, tail tap-split OFF) stay
    numerically equivalent — they are A/B'd on hardware, so both branches
    must keep working."""
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    want, _ = codec.apply({"params": params}, inputs, method=SemanticCodec.decode)

    monkeypatch.setenv("JPDSE_HEAD_FOLD", "1")
    monkeypatch.setenv("JPDSE_TAIL_SPLIT", "0")
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    assert fast.netG.head_fold in ("w", "hw") and fast.netG.tail_split == "none"
    got = fast.decode(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
