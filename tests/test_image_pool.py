import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.utils.image_pool import init_pool, query


def test_pool_fills_then_replays():
    pool = init_pool(4, (2, 2, 1))
    key = jax.random.PRNGKey(0)
    # first 4 images pass through and fill the pool
    imgs = jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1, 1) * jnp.ones((4, 2, 2, 1))
    pool, out = query(pool, imgs, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    assert int(pool.num_imgs) == 4
    # subsequent queries return either the new image or a stored one
    new = jnp.full((8, 2, 2, 1), 99.0)
    pool, out = query(pool, new, jax.random.PRNGKey(1))
    vals = set(np.unique(np.asarray(out)))
    assert vals <= {0.0, 1.0, 2.0, 3.0, 99.0}
    assert 99.0 in vals or len(vals) > 0
    assert int(pool.num_imgs) == 4


def test_zero_pool_is_identity():
    pool = init_pool(0, (2, 2, 1))
    imgs = jnp.ones((3, 2, 2, 1))
    pool2, out = query(pool, imgs, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


def test_pool_in_train_step(rng):
    """pool_size>0 wires through the jitted step."""
    from jpdse_tpu.models import build_discriminator
    from jpdse_tpu.train.state import create_train_state
    from jpdse_tpu.train.step import make_train_step
    from tests.test_codec_model import H, W, init_codec, tiny_batch, tiny_cfg

    cfg = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_generator_binarization=True,
        pool_size=4,
    )
    cfg.loss.no_vgg_loss = True
    batch = tiny_batch(rng)
    codec, params_g, inputs = init_codec(cfg, batch)
    disc = build_discriminator(cfg)
    d_in = jnp.concatenate([inputs["input_label"], batch["image"]], axis=-1)
    params_d = disc.init(jax.random.PRNGKey(4), d_in)["params"]
    state = create_train_state(
        cfg, params_g, params_d, pool_image_shape=(H, W, cfg.netD_input_nc)
    )
    step = make_train_step(cfg, codec, disc, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert int(state.pool.num_imgs) == 2  # batch of 2 filled in
    assert np.isfinite(float(metrics["loss_D"]))
    state, _ = step(state, batch, jax.random.PRNGKey(6))
    assert int(state.pool.num_imgs) == 4
