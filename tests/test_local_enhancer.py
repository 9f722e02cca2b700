"""LocalEnhancer (netG 'local') configuration: forward shapes, torch parity of
the enhancer pyramid structure, and the niter_fix_global freeze."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.models import build_discriminator
from jpdse_tpu.models.codec import SemanticCodec, prepare_inputs
from jpdse_tpu.models.generator import LocalEnhancer
from jpdse_tpu.train.state import create_train_state
from jpdse_tpu.train.step import make_train_step

from tests.test_codec_model import H, W, tiny_batch, tiny_cfg


def test_local_enhancer_forward_shapes(rng):
    m = LocalEnhancer(
        input_nc=5, output_nc=3, ngf=4, n_downsample_global=2,
        n_blocks_global=2, n_local_enhancers=1, n_blocks_local=1,
    )
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 5)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 32, 64, 3)
    # global trunk params exist; its unused tail does not
    assert "global" in v["params"]
    assert "tail" not in v["params"]["global"]
    assert "local1_down" in v["params"] and "local1_up" in v["params"]


def _local_setup(rng):
    cfg = tiny_cfg(
        netG="local",
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
        n_local_enhancers=1,
        n_blocks_local=1,
        niter_fix_global=1,
    )
    cfg.loss.no_vgg_loss = True
    batch = tiny_batch(rng)
    codec = SemanticCodec(cfg)
    inputs = prepare_inputs(cfg, batch["label"], batch["instance"], batch["image"])
    variables = codec.init(
        {"params": jax.random.PRNGKey(0)}, inputs, method=SemanticCodec.decode
    )
    disc = build_discriminator(cfg)
    d_in = jnp.concatenate([inputs["input_label"], batch["image"]], axis=-1)
    params_d = disc.init(jax.random.PRNGKey(4), d_in)["params"]
    state = create_train_state(cfg, variables["params"], params_d)
    return cfg, codec, disc, state, batch


def test_niter_fix_global_freezes_trunk(rng):
    cfg, codec, disc, state, batch = _local_setup(rng)
    step = make_train_step(cfg, codec, disc, donate=False, freeze_global=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss_G"]))
    # global trunk untouched
    for a, b in zip(
        jax.tree.leaves(state.params_g["netG"]["global"]),
        jax.tree.leaves(new_state.params_g["netG"]["global"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # enhancer layers trained
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.params_g["netG"]["local1_up"]),
            jax.tree.leaves(new_state.params_g["netG"]["local1_up"]),
        )
    )
    assert changed

    # unfrozen step trains the trunk too
    step2 = make_train_step(cfg, codec, disc, donate=False, freeze_global=False)
    new_state2, _ = step2(state, batch, jax.random.PRNGKey(5))
    changed_global = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.params_g["netG"]["global"]),
            jax.tree.leaves(new_state2.params_g["netG"]["global"]),
        )
    )
    assert changed_global
