"""Block-granular rematerialization (optim.remat) must be semantically
invisible: identical param tree, identical loss, identical gradients —
it only changes what XLA keeps in HBM during the backward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdse_tpu.models.codec import SemanticCodec

from tests.test_codec_model import init_codec, tiny_batch, tiny_cfg


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _loss_and_grad(cfg, batch):
    codec, params, inputs = init_codec(cfg, batch)

    def loss_fn(p):
        out, _ = codec.apply(
            {"params": p}, inputs, train=True, deterministic=False,
            rngs={"binarize": jax.random.PRNGKey(7),
                  "dropout": jax.random.PRNGKey(8)},
            method=SemanticCodec.decode,
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return params, loss, grads


def test_remat_identical_params_loss_grads(rng):
    batch = tiny_batch(rng)
    cfg = tiny_cfg(no_generator_binarization=True)
    cfg.optim.remat = False
    params0, loss0, grads0 = _loss_and_grad(cfg, batch)

    cfg_r = tiny_cfg(no_generator_binarization=True)
    cfg_r.optim.remat = True
    params1, loss1, grads1 = _loss_and_grad(cfg_r, batch)

    # identical parameter tree (checkpoints interchangeable across the flag)
    assert jax.tree_util.tree_structure(params0) == jax.tree_util.tree_structure(params1)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params0, params1,
    )
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        grads0, grads1,
    )


def test_remat_batch_norm_trains(rng):
    """static_argnums must make `train` genuinely static: with --norm batch
    the Norm layer branches on it in Python (BatchNorm use_running_average),
    which crashes if the bool is traced (regression test for the off-by-one
    flax static_argnums indexing)."""
    batch = tiny_batch(rng)
    cfg = tiny_cfg(no_generator_binarization=True, norm="batch")
    cfg.optim.remat = True
    codec, params, inputs = init_codec(cfg, batch)
    out = codec.apply(
        {"params": params}, inputs, train=True, deterministic=False,
        rngs={"binarize": jax.random.PRNGKey(7),
              "dropout": jax.random.PRNGKey(8)},
        method=SemanticCodec.decode,
        mutable=["batch_stats"],
    )
    (fake, _), _ = out
    assert np.isfinite(np.asarray(fake, np.float32)).all()
