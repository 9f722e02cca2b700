"""Codec-model assembly + train-step tests on tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdse_tpu.config import Config, apply_dataset_defaults
from jpdse_tpu.models import SemanticCodec, build_discriminator, prepare_inputs
from jpdse_tpu.models.codec import SemanticCodec as SC
from jpdse_tpu.train.state import create_train_state
from jpdse_tpu.train.step import (
    make_codes_fn,
    make_eval_step,
    make_infer_fn,
    make_train_step,
)

H, W = 32, 64


def tiny_cfg(**model_overrides) -> Config:
    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.data.num_labels = 6
    m = cfg.model
    m.ngf = m.ndf = m.nef = m.ne4lf = 8
    m.n_downsample_global = 2
    m.n_blocks_global = 2
    m.n_downsample_E = 2
    m.n_downsample_E4label = 2
    m.label_encoder_out_channels = 7
    m.encoder_binarizer_out_channels = 16
    m.label_encoder_binarizer_out_channels = 16
    m.generator_binarizer_out_channels = 16
    m.max_instance_id = 64
    for k, v in model_overrides.items():
        setattr(m, k, v)
    cfg.validate()
    return cfg


def tiny_batch(rng, b=2):
    return {
        "label": jnp.asarray(rng.integers(0, 6, (b, H, W)).astype(np.int32)),
        "instance": jnp.asarray(rng.integers(0, 50, (b, H, W)).astype(np.int32)),
        "image": jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32)),
    }


def init_codec(cfg, batch):
    codec = SemanticCodec(cfg)
    inputs = prepare_inputs(cfg, batch.get("label"), batch.get("instance"), batch["image"])
    rngs = {
        "params": jax.random.PRNGKey(0),
        "binarize": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = codec.init(rngs, inputs, method=SC.decode)
    return codec, variables["params"], inputs


def test_learned_codec_decode_and_codes(rng):
    """Fully learned config: binarized label + visual encoders feeding G."""
    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    fake, input_label = codec.apply({"params": params}, inputs, method=SC.decode)
    assert fake.shape == (2, H, W, 3)
    assert input_label.shape == (2, H, W, 7)  # encoded labels
    codes = codec.apply({"params": params}, inputs, method=SC.get_codes)
    assert len(codes) == 2  # label code + visual code
    for c in codes:
        assert c.ndim == 2 and c.shape[0] == 2
        assert set(np.unique(np.asarray(c))) <= {0.0, 1.0}
    # spatial code size: H/4 * W/4 * 16 bits
    assert codes[0].shape[1] == (H // 4) * (W // 4) * 16


def test_generator_binarized_codec(rng):
    """Generator-bottleneck binarization (raw semantics + raw visuals)."""
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=False,
        bin_generator_before_res=True,
    )
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    fake, input_label = codec.apply(
        {"params": params},
        inputs,
        method=SC.decode,
        rngs={"binarize": jax.random.PRNGKey(3)},
        deterministic=False,
    )
    assert fake.shape == (2, H, W, 3)
    assert input_label.shape == (2, H, W, 7)  # 6 one-hot + edge
    codes = codec.apply({"params": params}, inputs, method=SC.get_codes)
    assert len(codes) == 1


def test_flagship_bpg_style_config(rng):
    """Phase-2 config: raw one-hot + edge + compressed visuals, no binarizers."""
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
    )
    cfg.codec.use_compressed = True
    cfg.codec.ext = "jpg"
    batch = tiny_batch(rng)
    batch["compressed"] = batch["image"] + 0.01
    codec = SemanticCodec(cfg)
    inputs = prepare_inputs(
        cfg, batch["label"], batch["instance"], batch["image"], batch["compressed"]
    )
    variables = codec.init({"params": jax.random.PRNGKey(0)}, inputs, method=SC.decode)
    fake, input_label = codec.apply(variables, inputs, method=SC.decode)
    assert fake.shape == (2, H, W, 3)
    codes = codec.apply(variables, inputs, method=SC.get_codes)
    assert codes == []  # nothing binarized in this configuration


def test_sem_masking_config(rng):
    cfg = tiny_cfg(
        sem_masking=True,
        no_label_encoding=True,
        netE_groups=1,
        no_generator_binarization=True,
    )
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    assert inputs["masked_img"].shape == (2, H, W, 7 * 3)
    fake, _ = codec.apply({"params": params}, inputs, method=SC.decode)
    assert fake.shape == (2, H, W, 3)


def test_inst_wise_pool_config(rng):
    cfg = tiny_cfg(inst_wise_pool=True, no_generator_binarization=True)
    batch = tiny_batch(rng)
    codec, params, inputs = init_codec(cfg, batch)
    fake, _ = codec.apply({"params": params}, inputs, method=SC.decode)
    assert fake.shape == (2, H, W, 3)


def test_train_step_runs_and_updates(rng):
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
    )
    cfg.loss.no_vgg_loss = True  # keep the tiny test fast
    batch = tiny_batch(rng)
    codec, params_g, inputs = init_codec(cfg, batch)
    disc = build_discriminator(cfg)
    d_in = jnp.concatenate([inputs["input_label"], batch["image"]], axis=-1)
    params_d = disc.init(jax.random.PRNGKey(4), d_in)["params"]

    state = create_train_state(cfg, params_g, params_d)
    step = make_train_step(cfg, codec, disc, vgg_apply=None, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(5))

    assert int(new_state.steps_taken) == 1
    for k in ("G_GAN", "G_GAN_Feat", "G_Distortion", "D_real", "D_fake"):
        assert np.isfinite(float(metrics[k])), k
    # both players' params changed
    def changed(a, b):
        return any(
            not np.allclose(x, y)
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert changed(state.params_g, new_state.params_g)
    assert changed(state.params_d, new_state.params_d)


def test_train_step_loss_disable_flags(rng):
    """Phase-3 style: distortion-only fine-tune (no GAN/VGG/feat losses)."""
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
    )
    cfg.loss.no_vgg_loss = True
    cfg.loss.no_g_gan_loss = True
    cfg.loss.no_d_gan_loss = True
    cfg.loss.no_gan_feat_loss = True
    batch = tiny_batch(rng)
    codec, params_g, inputs = init_codec(cfg, batch)
    disc = build_discriminator(cfg)
    d_in = jnp.concatenate([inputs["input_label"], batch["image"]], axis=-1)
    params_d = disc.init(jax.random.PRNGKey(4), d_in)["params"]
    state = create_train_state(cfg, params_g, params_d)
    step = make_train_step(cfg, codec, disc, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert float(metrics["loss_D"]) == 0.0
    # D untouched when its loss is disabled (zero grads, but Adam eps keeps it
    # stationary only with zero updates — verify)
    for x, y in zip(jax.tree.leaves(state.params_d), jax.tree.leaves(new_state.params_d)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_lambda_annealing(rng):
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
    )
    cfg.loss.no_vgg_loss = True
    cfg.loss.anneal_lambda = True
    cfg.loss.anneal_interval = 2
    cfg.loss.anneal_factor = 5.0
    batch = tiny_batch(rng)
    codec, params_g, inputs = init_codec(cfg, batch)
    disc = build_discriminator(cfg)
    d_in = jnp.concatenate([inputs["input_label"], batch["image"]], axis=-1)
    params_d = disc.init(jax.random.PRNGKey(4), d_in)["params"]
    state = create_train_state(cfg, params_g, params_d)
    step = make_train_step(cfg, codec, disc, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(5))
    assert float(state.lambda_distortion_weight) == 1.0
    state, _ = step(state, batch, jax.random.PRNGKey(6))
    assert float(state.lambda_distortion_weight) == 5.0


def test_eval_infer_and_zero_ablations(rng):
    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
    )
    batch = tiny_batch(rng)
    codec, params_g, _ = init_codec(cfg, batch)
    ev = make_eval_step(cfg, codec)
    loss = ev(params_g, {}, batch)
    assert np.isfinite(float(loss)) and float(loss) >= 0
    inf = make_infer_fn(cfg, codec)
    img = inf(params_g, {}, batch)
    assert img.shape == (2, H, W, 3)

    # zero_sem ablation changes the output (same params, ablated module —
    # the ablation is static model config, pix2pixHD_model.py:583-606)
    cfg2 = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
        zero_sem=True,
    )
    inf2 = make_infer_fn(cfg2, SemanticCodec(cfg2))
    img2 = inf2(params_g, {}, batch)
    assert not np.allclose(np.asarray(img), np.asarray(img2))


def test_batchnorm_train_step(rng):
    """--norm batch trains end-to-end: running stats live in the train state
    (mstate_g/mstate_d), are updated by the step, and feed eval reads."""
    from jpdse_tpu.trainer import Trainer

    cfg = tiny_cfg(
        norm="batch",
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
    )
    cfg.loss.no_vgg_loss = True
    cfg.data.batch_size = 2
    batch = {k: np.asarray(v) for k, v in tiny_batch(rng).items()}
    tr = Trainer(cfg, "train", sample_batch=batch)
    assert tr.state.mstate_g and "batch_stats" in tr.state.mstate_g
    assert tr.state.mstate_d and "batch_stats" in tr.state.mstate_d
    before_g = jax.tree.map(np.asarray, tr.state.mstate_g)
    metrics = tr.step(batch)
    assert np.isfinite(metrics["loss_G"]) and np.isfinite(metrics["loss_D"])
    after_g = tr.state.mstate_g
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before_g), jax.tree.leaves(after_g))
    )
    assert changed, "running stats did not update"
    # eval path consumes the updated stats without error
    assert np.isfinite(tr.get_eval_loss(batch))
    assert tr.get_img(batch).shape == batch["image"].shape


def test_rate_fn_matches_host_loop(rng):
    """Batched on-device get_eval_rate == the reference-style per-code,
    per-image host loop (pix2pixHD_model.py:468-492)."""
    from jpdse_tpu.ops.metrics import bernoulli_shannon_bpp
    from jpdse_tpu.train.step import make_rate_fn

    cfg = tiny_cfg(no_generator_binarization=True)
    batch = tiny_batch(rng)
    codec, params_g, _ = init_codec(cfg, batch)
    rate = make_rate_fn(cfg, codec)
    s_fast, a_fast = rate(params_g, {}, batch)

    codes_fn = make_codes_fn(cfg, codec)
    codes = codes_fn(params_g, {}, batch)
    num_pixels = H * W
    b = batch["image"].shape[0]
    s_slow = a_slow = 0.0
    for code in codes:
        for j in range(b):
            s, a = bernoulli_shannon_bpp(code[j], num_pixels)
            s_slow += float(s)
            a_slow += float(a)
    assert abs(float(s_fast) - s_slow / b) < 1e-5
    assert abs(float(a_fast) - a_slow / b) < 1e-6


def test_code_and_contexts_layout(rng):
    """get_code_and_contexts: flat codes match get_code; context ids cycle
    per channel within each code and are disjoint across codes."""
    from jpdse_tpu.trainer import Trainer

    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.data.batch_size = 2
    batch = {k: np.asarray(v) for k, v in tiny_batch(rng).items()}
    tr = Trainer(cfg, "test", sample_batch=batch)
    codes = tr.get_code(batch)
    codes2, ctx, shapes = tr.get_code_and_contexts(batch)
    np.testing.assert_array_equal(codes, codes2)
    assert ctx.shape == (codes.shape[1],)
    assert sum(h * w * c for h, w, c in shapes) == codes.shape[1]
    # two binarized encoders at 16 channels each -> 32 distinct contexts
    assert ctx.min() == 0 and ctx.max() == 31
    assert set(np.unique(ctx)) == set(range(32))


def test_remat_train_step_matches(rng):
    """optim.remat (jax.checkpoint on the decode) changes memory, not math."""
    from jpdse_tpu.models import build_discriminator
    from jpdse_tpu.train.state import create_train_state

    batch = tiny_batch(rng)
    metrics = {}
    states = {}
    for remat in (False, True):
        cfg = tiny_cfg(no_generator_binarization=True)
        cfg.optim.remat = remat
        cfg.loss.no_vgg_loss = True
        codec, params_g, _ = init_codec(cfg, batch)
        disc = build_discriminator(cfg)
        d_in = jnp.zeros((1, H, W, cfg.netD_input_nc), jnp.float32)
        params_d = disc.init(jax.random.PRNGKey(3), d_in)["params"]
        state = create_train_state(cfg, params_g, params_d)
        step = make_train_step(cfg, codec, disc, None, donate=False)
        new_state, m = step(state, batch, jax.random.PRNGKey(7))
        metrics[remat] = {k: float(v) for k, v in m.items()}
        states[remat] = new_state
    for k in metrics[False]:
        assert abs(metrics[False][k] - metrics[True][k]) < 1e-4, (k, metrics)
    # params after ONE Adam step: remat recomputes forwards with different
    # float reassociation, and Adam normalizes tiny gradient deltas to
    # O(lr)-scale update deltas — so bound by a small multiple of lr (2e-4),
    # not float tolerance
    for a, b in zip(
        jax.tree.leaves(states[False].params_g), jax.tree.leaves(states[True].params_g)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_vgg_bf16_close_to_fp32(rng):
    """optim.vgg_bf16 (round-5 throughput lever): the bf16 VGG trunk's
    perceptual loss must track the fp32 one closely (features differ at bf16
    precision; the slice L1s reduce in fp32 either way)."""
    from jpdse_tpu.models.vgg import Vgg19Features
    from jpdse_tpu.train.losses import vgg_loss

    model32 = Vgg19Features()
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32)) * 0.3
    y = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32)) * 0.3
    v32 = model32.init(jax.random.PRNGKey(0), x)
    model16 = Vgg19Features(dtype=jnp.bfloat16)
    v16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v32)

    l32 = float(vgg_loss(lambda t: model32.apply(v32, t), x, y))
    l16 = float(vgg_loss(lambda t: model16.apply(v16, t), x, y))
    assert np.isfinite(l16)
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.05
