"""Fused instance-norm kernel: numerical parity with the reference-jnp path
(interpret mode on CPU) and VJP correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdse_tpu.models.layers import instance_norm
from jpdse_tpu.ops.pallas import instance_norm as pin


@pytest.fixture
def force_interpret(monkeypatch):
    """Run the pallas kernel in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_fused_matches_jnp(rng, force_interpret):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 4)).astype(np.float32) * 3 + 1)
    got = pin._fused_in(x, None, False, 1e-5)
    want = instance_norm(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_relu_residual(rng, force_interpret):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    got = pin._fused_in(x, res, True, 1e-5)
    want = jax.nn.relu(instance_norm(x)) + res
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_channel_tiling_grid(rng, force_interpret):
    # C not a power-of-two multiple of the tile: 6 channels
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 6)).astype(np.float32))
    got = pin._fused_in(x, None, False, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(instance_norm(x)), atol=1e-5)


def test_vjp_matches_autodiff(rng, force_interpret):
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))

    def ref_fn(v):
        return jnp.sum(jax.nn.relu(instance_norm(v)) * g)

    def fused_fn(v):
        return jnp.sum(pin._fused_in(v, None, True, 1e-5) * g)

    ref_grad = jax.grad(ref_fn)(x)
    fused_grad = jax.grad(fused_fn)(x)
    np.testing.assert_allclose(np.asarray(fused_grad), np.asarray(ref_grad), atol=2e-5)


def test_fallback_path(rng):
    """Off-TPU without interpret mode, the public API uses the jnp path."""
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    got = pin.fused_instance_norm(x, relu=True)
    want = jax.nn.relu(instance_norm(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
