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


def test_fast_decode_local_enhancer(rng):
    """netG 'local' (LocalEnhancer pyramid, networks.py:144-196) through the
    s2d fast path, with binarized label + visual encoders feeding it."""
    cfg = tiny_cfg(
        netG="local",
        n_local_enhancers=1,
        n_blocks_local=1,
        no_generator_binarization=True,
    )
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    want, _ = codec.apply({"params": params}, inputs, method=SemanticCodec.decode)
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    got = fast.decode(batch)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fast_decode_local_two_enhancers(rng):
    """n_local_enhancers=2: the inner enhancer's up-trunk has NO tail (plain
    deconv, has_back=False) — a distinct _FastTrunk section layout from the
    final enhancer's s2d back stage."""
    cfg = tiny_cfg(
        netG="local",
        n_local_enhancers=2,
        n_blocks_local=1,
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
    )
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    want, _ = codec.apply({"params": params}, inputs, method=SemanticCodec.decode)
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    got = fast.decode(batch)
    assert got.shape == want.shape
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


def test_trainer_fast_inference_flag(rng, tmp_path):
    """--fast_inference routes get_img / get_code / compress through FastCodec
    and matches the standard path; unsupported configs fall back cleanly."""
    from jpdse_tpu.trainer import Trainer

    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.model.compute_dtype = "float32"  # exact comparison on CPU
    cfg.save_dir = str(tmp_path)
    cfg.is_train = False
    batch = {k: np.asarray(v) for k, v in tiny_batch(rng).items()}

    t_std = Trainer(cfg, mode="test", sample_batch=batch)
    assert t_std._fast is None

    import dataclasses

    cfg_f = dataclasses.replace(cfg)
    cfg_f.model = dataclasses.replace(cfg.model, fast_inference=True)
    t_fast = Trainer(cfg_f, mode="test", sample_batch=batch)
    # same seed => same init params; fast path must be active
    assert t_fast._fast is not None
    np.testing.assert_allclose(
        t_fast.get_img(batch), t_std.get_img(batch), atol=2e-4
    )
    np.testing.assert_array_equal(t_fast.get_code(batch), t_std.get_code(batch))
    s_f = t_fast.compress(batch)
    s_s = t_std.compress(batch)
    assert [bytes(a) for a in s_f] == [bytes(b) for b in s_s]

    # unsupported config (grouped encoder) falls back to the standard path
    cfg_u = tiny_cfg(no_generator_binarization=True, sem_masking=True)
    cfg_u.model = dataclasses.replace(cfg_u.model, fast_inference=True)
    cfg_u.save_dir = str(tmp_path)
    cfg_u.is_train = False
    t_u = Trainer(cfg_u, mode="test", sample_batch=batch)
    assert t_u._fast is None


def test_fast_decode_from_codes_matches(rng):
    """FastCodec.decode_from_codes (the deploy-time bitstream decoder) ==
    SemanticCodec.decode_from_codes at equal weights and codes."""
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    codes = codec.apply(
        {"params": params}, inputs, method=SemanticCodec.get_codes_shaped
    )
    want = codec.apply(
        {"params": params}, codes, method=SemanticCodec.decode_from_codes
    )
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    got = fast.decode_from_codes(codes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fast_decode_from_codes_generator_bottleneck(rng):
    cfg = tiny_cfg(
        no_label_encoding=True, no_feat_encoding=True,
        no_generator_binarization=False, bin_generator_before_res=True,
    )
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    codes = codec.apply(
        {"params": params}, inputs, method=SemanticCodec.get_codes_shaped
    )
    want = codec.apply(
        {"params": params}, codes, method=SemanticCodec.decode_from_codes
    )
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    got = fast.decode_from_codes(codes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fast_decode_from_codes_generator_bottleneck_after_res(rng):
    """after_res (bin_generator_before_res=False) is the DEFAULT bottleneck
    position — its decode-from-code path skips the res blocks entirely."""
    cfg = tiny_cfg(
        no_label_encoding=True, no_feat_encoding=True,
        no_generator_binarization=False, bin_generator_before_res=False,
    )
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    codes = codec.apply(
        {"params": params}, inputs, method=SemanticCodec.get_codes_shaped
    )
    want = codec.apply(
        {"params": params}, codes, method=SemanticCodec.decode_from_codes
    )
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    got = fast.decode_from_codes(codes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


# -- s2d end-to-end mode (JPDSE_S2D_E2E): inputs born in the s2d domain,
# trunk boundaries stay s2d, fronts enter through the pad-3 re-alignment.
# The head convs consume bit-identical tensors, so e2e must match the
# standard fast path EXACTLY (array_equal), not just within tolerance.


def _e2e_pair(cfg, params, monkeypatch):
    std = FastCodec(cfg, params, dtype=jnp.float32)
    assert not std.s2d_e2e
    monkeypatch.setenv("JPDSE_S2D_E2E", "1")
    e2e = FastCodec(cfg, params, dtype=jnp.float32)
    assert e2e.s2d_e2e
    return std, e2e


def test_fast_decode_s2d_e2e_bit_exact_learned(rng, monkeypatch):
    """Fully-learned flagship shape (binarized netE4label + netE feeding G):
    all three trunk boundaries ride the s2d domain."""
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    _, params, _ = init_codec(cfg, batch)
    std, e2e = _e2e_pair(cfg, params, monkeypatch)
    want = std.decode(batch)
    got = e2e.decode(batch)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for g, w in zip(e2e.get_codes_shaped(batch), std.get_codes_shaped(batch)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fast_decode_s2d_e2e_raw_flagship(rng, monkeypatch):
    """Raw one-hot semantics + compressed visuals straight into G (the
    reference's flagship config): 3-component interleave (one-hot, edge,
    visuals), no upstream trunks."""
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
    variables = codec.init(
        {"params": jax.random.PRNGKey(0)}, inputs, method=SemanticCodec.decode
    )
    std, e2e = _e2e_pair(cfg, variables["params"], monkeypatch)
    np.testing.assert_array_equal(
        np.asarray(e2e.decode(batch)), np.asarray(std.decode(batch))
    )


def test_fast_decode_s2d_e2e_generator_binarized(rng, monkeypatch):
    """G-bottleneck config: the encode path enters netG via front_s2d; the
    deterministic sign sees bit-identical pre-activations."""
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=False,
        bin_generator_before_res=True,
    )
    batch = tiny_batch(rng)
    _, params, _ = init_codec(cfg, batch)
    std, e2e = _e2e_pair(cfg, params, monkeypatch)
    np.testing.assert_array_equal(
        np.asarray(e2e.decode(batch)), np.asarray(std.decode(batch))
    )
    for g, w in zip(e2e.get_codes_shaped(batch), std.get_codes_shaped(batch)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fast_decode_s2d_e2e_no_instance(rng, monkeypatch):
    """no_instance: the semantic input is the one-hot alone (single-component
    interleave is the identity)."""
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
        no_instance=True,
    )
    batch = tiny_batch(rng)
    _, params, _ = init_codec(cfg, batch)
    std, e2e = _e2e_pair(cfg, params, monkeypatch)
    np.testing.assert_array_equal(
        np.asarray(e2e.decode(batch)), np.asarray(std.decode(batch))
    )


def test_fast_decode_from_codes_s2d_e2e_learned(rng, monkeypatch):
    """Deploy decoder, fully-learned config: code-fed netE4label/netE exit
    pre-d2s and netG enters via front_s2d — bit-exact vs the standard fast
    deploy decoder."""
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    codes = codec.apply(
        {"params": params}, inputs, method=SemanticCodec.get_codes_shaped
    )
    std, e2e = _e2e_pair(cfg, params, monkeypatch)
    np.testing.assert_array_equal(
        np.asarray(e2e.decode_from_codes(codes)),
        np.asarray(std.decode_from_codes(codes)),
    )


def test_fast_decode_from_codes_s2d_e2e_raw_side(rng, monkeypatch):
    """Deploy decoder, raw flagship config: everything rides as .jpds side
    info (loader-shaped side_batch), assembled directly in the s2d domain."""
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
    variables = codec.init(
        {"params": jax.random.PRNGKey(0)}, inputs, method=SemanticCodec.decode
    )
    std, e2e = _e2e_pair(cfg, variables["params"], monkeypatch)
    want = std.decode_from_codes([], side_batch=batch)
    got = e2e.decode_from_codes([], side_batch=batch)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # missing side info raises the same error in e2e mode
    import pytest as _pytest

    with _pytest.raises(ValueError, match="side info"):
        e2e.decode_from_codes_fn(e2e.weights, [], None)


def test_s2d_e2e_defers_to_pallas_head(rng, monkeypatch, capsys):
    """s2d_e2e + an EFFECTIVE pallas head would round-trip every trunk input
    through depth_to_space and back (front_s2d's pallas fallback), inverting
    the e2e saving — the e2e assembly must disable itself (with a printed
    reason) when any trunk actually selects the pallas head kernel."""
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    _, params, _ = init_codec(cfg, batch)
    monkeypatch.setenv("JPDSE_S2D_E2E", "1")
    monkeypatch.setenv("JPDSE_HEAD_PALLAS", "force")
    fc = FastCodec(cfg, params, dtype=jnp.float32)
    assert not fc.s2d_e2e
    assert "s2d_e2e (JPDSE_S2D_E2E) disabled" in capsys.readouterr().out


def test_s2d_e2e_survives_ineffective_pallas_request(rng, monkeypatch, capsys):
    """head_pallas='1' below the c4>=64 bar selects NO pallas head (the
    trunks keep the XLA conv), so s2d_e2e must stay enabled — the gate keys
    on the effective per-trunk decision, not the raw knob."""
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    _, params, _ = init_codec(cfg, batch)
    monkeypatch.setenv("JPDSE_S2D_E2E", "1")
    monkeypatch.setenv("JPDSE_HEAD_PALLAS", "1")
    fc = FastCodec(cfg, params, dtype=jnp.float32)
    assert all(
        t.head_fold != "pallas"
        for t in (fc.netG, fc.netE, fc.netE4label) if t is not None
    ), "tiny trunks should be below the pallas-head channel bar"
    assert fc.s2d_e2e
    assert "disabled" not in capsys.readouterr().out


def test_fast_config_knobs_without_env(rng, monkeypatch):
    """The fast-path variants are reachable through config fields alone
    (model.fast.*, round-trippable via opt.json) — no env vars set."""
    for var in ("JPDSE_S2D_E2E", "JPDSE_HEAD_PALLAS", "JPDSE_HEAD_FOLD",
                "JPDSE_TAIL_SPLIT", "JPDSE_TAIL_WGROUP",
                "JPDSE_FUSED_REALIGN", "JPDSE_FRONT_REALIGN",
                "JPDSE_NORM_SHIFT"):
        monkeypatch.delenv(var, raising=False)
    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.model.fast.head_fold = True
    cfg.model.fast.tail_split = False
    cfg.model.fast.s2d_e2e = True
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    want, _ = codec.apply({"params": params}, inputs, method=SemanticCodec.decode)

    from jpdse_tpu.config import Config

    cfg2 = Config.from_dict(cfg.to_dict())  # opt.json round trip
    assert cfg2.model.fast.head_fold and not cfg2.model.fast.tail_split
    assert cfg2.model.fast.s2d_e2e
    fast = FastCodec(cfg2, params, dtype=jnp.float32)
    assert fast.netG.head_fold in ("w", "hw")
    assert fast.netG.tail_split == "none"
    assert fast.s2d_e2e
    got = fast.decode(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fast_config_env_overrides_config(rng, monkeypatch):
    """Env vars beat config fields (the A/B sweep contract)."""
    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.model.fast.tail_split = True
    monkeypatch.setenv("JPDSE_TAIL_SPLIT", "0")
    batch = tiny_batch(rng)
    _, params, _ = init_codec(cfg, batch)
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    assert fast.netG.tail_split == "none"


def test_fast_config_validation():
    """Config.validate rejects bad domains and the force+s2d_e2e combo."""
    import pytest

    from jpdse_tpu.config import Config

    cfg = Config()
    # make the base config pass the reference's binarize-XOR check (its
    # defaults violate it too; validate() runs at model construction)
    cfg.model.no_generator_binarization = True
    cfg.model.fast.fused_realign = "bogus"
    with pytest.raises(ValueError, match="fused_realign"):
        cfg.validate()
    cfg.model.fast.fused_realign = "auto"
    cfg.model.fast.s2d_e2e = True
    cfg.model.fast.head_pallas = "force"
    with pytest.raises(ValueError, match="s2d_e2e"):
        cfg.validate()
    # '1' (channel-gated) + s2d_e2e is allowed: the runtime defers only
    # when a pallas head is actually selected
    cfg.model.fast.head_pallas = "1"
    cfg.validate()


def test_fast_decode_with_sem_downsample(rng):
    """codec.sem_downsample (round-5 reduced-rate semantics): the fast path
    must degrade the maps identically to the standard decode (both go
    through prepare_inputs), and the s2d-e2e assembly must defer (it has no
    degrade step)."""
    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.codec.sem_downsample = 2
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    want, _ = codec.apply({"params": params}, inputs, method=SemanticCodec.decode)
    fast = FastCodec(cfg, params, dtype=jnp.float32)
    assert not fast.s2d_e2e
    got = fast.decode(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
