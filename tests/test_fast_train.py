"""Fast TRAIN path (optim.fast_train, models/fast_train.py): the s2d
generator re-expression running differentiably inside the train step.
Pins: forward equality with the standard decode, gradient equality of the
FULL GAN step (both players), eligibility gating, and remat compatibility.
Run in f32 on CPU so tolerances are tight (the transforms are exact linear
re-layouts — differences are pure float reassociation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdse_tpu.cli import apply_dataset_defaults
from jpdse_tpu.config import Config
from jpdse_tpu.models import build_discriminator
from jpdse_tpu.models.codec import SemanticCodec, prepare_inputs
from jpdse_tpu.models.fast_train import (
    fast_train_ineligible_reason,
    make_fast_train_decode,
)
from jpdse_tpu.train.state import create_train_state
from jpdse_tpu.train.step import make_train_step

H, W = 32, 64


def flagship_like_cfg(**overrides) -> Config:
    """Tiny version of the flagship recipe: raw semantics + visual straight
    into a global generator, instance norm, f32 for tolerance."""
    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.data.num_labels = 6
    m = cfg.model
    m.compute_dtype = "float32"
    m.ngf = m.ndf = 8
    m.n_downsample_global = 2
    m.n_blocks_global = 2
    m.no_label_encoding = True
    m.no_feat_encoding = True
    m.no_generator_binarization = True
    m.max_instance_id = 64
    cfg.loss.no_vgg_loss = True
    for k, v in overrides.items():
        setattr(m, k, v)
    cfg.validate()
    return cfg


def batch_for(rng, b=2):
    return {
        "label": jnp.asarray(rng.integers(0, 6, (b, H, W)).astype(np.float32)),
        "instance": jnp.asarray(rng.integers(0, 9, (b, H, W)).astype(np.int32)),
        "image": jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32)) * 0.3,
    }


def _setup(cfg, rng):
    codec = SemanticCodec(cfg)
    batch = batch_for(rng)
    inputs = prepare_inputs(
        cfg, batch["label"], batch["instance"], batch["image"], None
    )
    params_g = codec.init(jax.random.PRNGKey(1), inputs)["params"]
    disc = build_discriminator(cfg)
    d_in = jnp.concatenate([inputs["input_label"], batch["image"]], axis=-1)
    params_d = disc.init(jax.random.PRNGKey(2), d_in)["params"]
    return codec, disc, batch, inputs, params_g, params_d


def test_forward_matches_standard_decode(rng):
    cfg = flagship_like_cfg()
    codec, _, _, inputs, params_g, _ = _setup(cfg, rng)
    fast = make_fast_train_decode(cfg, codec)
    fake_fast, label_fast = fast(params_g, inputs)
    (fake_std, label_std) = codec.apply(
        {"params": params_g}, inputs, method=SemanticCodec.decode
    )
    np.testing.assert_allclose(
        np.asarray(fake_fast), np.asarray(fake_std), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(label_fast), np.asarray(label_std))


@pytest.mark.parametrize("remat", [False, True])
def test_full_step_metrics_match_standard(rng, remat):
    """The COMPLETE GAN step (G fwd, D passes, both losses, both updates)
    must produce the same loss metrics through the fast and standard
    decodes. (Updated params are NOT compared element-wise: Adam's first
    step is ~lr*sign(grad), which amplifies float-reassociation noise on
    near-zero gradients to full +-lr sign flips — the gradient test below
    pins the backward directly.)"""
    cfg = flagship_like_cfg()
    cfg.optim.remat = remat
    codec, disc, batch, _, params_g, params_d = _setup(cfg, rng)

    def run(fast):
        cfg.optim.fast_train = fast
        state = create_train_state(cfg, params_g, params_d)
        step = make_train_step(cfg, codec, disc, None, donate=False)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
        return new_state, {k: float(v) for k, v in metrics.items()}

    s_std, m_std = run(False)
    s_fast, m_fast = run(True)
    for k in m_std:
        assert abs(m_std[k] - m_fast[k]) <= 1e-3 * max(1.0, abs(m_std[k])), (
            k, m_std[k], m_fast[k],
        )


def test_generator_gradients_match_standard(rng):
    """d(fake)/d(params_g) through the fast decode equals the standard
    decode's, per leaf, at float-reassociation tolerance."""
    cfg = flagship_like_cfg()
    codec, _, _, inputs, params_g, _ = _setup(cfg, rng)
    fast = make_fast_train_decode(cfg, codec)
    probe = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))

    def loss_fast(p):
        fake, _ = fast(p, inputs)
        return jnp.sum(fake * probe)

    def loss_std(p):
        fake, _ = codec.apply(
            {"params": p}, inputs, method=SemanticCodec.decode
        )
        return jnp.sum(fake * probe)

    g_fast = jax.grad(loss_fast)(params_g)
    g_std = jax.grad(loss_std)(params_g)
    flat_fast, tree = jax.tree.flatten(g_fast)
    flat_std, tree2 = jax.tree.flatten(g_std)
    assert tree == tree2
    # absolute floor at the GLOBAL gradient scale: conv biases feeding
    # InstanceNorm have mathematically ZERO gradient (IN subtracts the mean
    # shift), so both paths produce only reassociation noise there — a
    # per-leaf relative tolerance would compare noise to noise
    global_scale = max(np.abs(np.asarray(b)).max() for b in flat_std)
    for a, b in zip(flat_fast, flat_std):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, atol=3e-4 * global_scale, rtol=1e-3
        )


def test_zero_sem_and_nosem_variants(rng):
    """The ablation-arm configs (zero_sem; no_label+no_instance) run through
    the fast decode and match the standard one."""
    for overrides in ({"zero_sem": True}, {"no_label": True, "no_instance": True}):
        cfg = flagship_like_cfg(**overrides)
        codec = SemanticCodec(cfg)
        b = batch_for(rng)
        inputs = prepare_inputs(
            cfg,
            None if cfg.model.no_label else b["label"],
            None if cfg.model.no_instance else b["instance"],
            b["image"],
            None,
        )
        params_g = codec.init(jax.random.PRNGKey(1), inputs)["params"]
        fast = make_fast_train_decode(cfg, codec)
        fake_fast, _ = fast(params_g, inputs)
        fake_std, _ = codec.apply(
            {"params": params_g}, inputs, method=SemanticCodec.decode
        )
        np.testing.assert_allclose(
            np.asarray(fake_fast), np.asarray(fake_std), atol=2e-5, rtol=1e-4
        )


def test_ineligible_configs_refused():
    assert fast_train_ineligible_reason(flagship_like_cfg()) is None
    cfg = flagship_like_cfg(use_dropout=True)
    assert "dropout" in fast_train_ineligible_reason(cfg)
    cfg = flagship_like_cfg()
    cfg.model.netG = "local"
    assert "local" in fast_train_ineligible_reason(cfg).lower()
    with pytest.raises(ValueError, match="fast_train unavailable"):
        make_fast_train_decode(cfg, SemanticCodec(cfg))


def test_learned_codec_forward_and_grads(rng):
    """The LEARNED flagship config (binarized netE + netE4label feeding G —
    the benchmarked train configuration): deterministic-binarization
    forward equality and generator-gradient equality through the fast
    decode. (Stochastic binarization draws a different — identically
    distributed — noise stream than flax's per-module rng fold, so only
    the deterministic path is compared bitwise.)"""
    from tests.test_codec_model import init_codec, tiny_batch, tiny_cfg

    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.model.compute_dtype = "float32"
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    fast = make_fast_train_decode(cfg, codec)

    fake_fast, label_fast = fast(params, inputs, None, deterministic=True)
    fake_std, label_std = codec.apply(
        {"params": params}, inputs, method=SemanticCodec.decode
    )
    np.testing.assert_allclose(
        np.asarray(fake_fast), np.asarray(fake_std), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(label_fast), np.asarray(label_std), atol=5e-5, rtol=1e-4
    )

    probe = jnp.asarray(
        np.random.default_rng(7).normal(size=fake_std.shape).astype(np.float32)
    )

    def loss_fast(p):
        fake, _ = fast(p, inputs, None, deterministic=True)
        return jnp.sum(fake * probe)

    def loss_std(p):
        fake, _ = codec.apply(
            {"params": p}, inputs, method=SemanticCodec.decode
        )
        return jnp.sum(fake * probe)

    g_fast = jax.grad(loss_fast)(params)
    g_std = jax.grad(loss_std)(params)
    flat_fast = jax.tree.leaves(g_fast)
    flat_std = jax.tree.leaves(g_std)
    global_scale = max(np.abs(np.asarray(b)).max() for b in flat_std)
    for a, b in zip(flat_fast, flat_std):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=3e-4 * global_scale, rtol=1e-3,
        )


def test_learned_codec_stochastic_path_runs(rng):
    """Stochastic binarization (train mode) through the fast decode: runs,
    produces +-1 codes downstream, and differs across keys."""
    from tests.test_codec_model import init_codec, tiny_batch, tiny_cfg

    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.model.compute_dtype = "float32"
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    fast = make_fast_train_decode(cfg, codec)
    f1, _ = fast(params, inputs, jax.random.PRNGKey(0), deterministic=False)
    f2, _ = fast(params, inputs, jax.random.PRNGKey(1), deterministic=False)
    assert np.isfinite(np.asarray(f1)).all()
    assert not np.array_equal(np.asarray(f1), np.asarray(f2))
