import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdse_tpu.ops.quantizers import (
    Binarizer,
    S2HVQ,
    S2HVQV2,
    deterministic_sign_ste,
    rounded_identity,
    stochastic_sign_ste,
)


def test_stochastic_sign_values_and_probability():
    key = jax.random.PRNGKey(0)
    x = jnp.full((20000,), 0.5)
    y = stochastic_sign_ste(x, key)
    assert set(np.unique(np.asarray(y))) <= {-1.0, 1.0}
    # P(+1) = (1+x)/2 = 0.75
    assert abs(float(jnp.mean(y == 1.0)) - 0.75) < 0.02


def test_stochastic_sign_straight_through_grad():
    """Mirror of the reference's __main__ gradient check (binarize.py:68-78)."""
    key = jax.random.PRNGKey(1)
    x = jnp.linspace(-0.9, 0.9, 16)
    g = jax.grad(lambda v: jnp.sum(stochastic_sign_ste(v, key) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones(16), rtol=1e-6)


def test_deterministic_sign():
    x = jnp.array([-0.3, 0.0, 0.7])
    y = deterministic_sign_ste(x)
    np.testing.assert_array_equal(np.asarray(y), [-1.0, 0.0, 1.0])
    g = jax.grad(lambda v: jnp.sum(deterministic_sign_ste(v)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_rounded_identity_ste():
    """Mirror of round.py:17-32: round at 1.4/1.5/1.6 with identity grad.
    Both torch and jnp round half to even -> round(1.5) == 2, round(2.5) == 2."""
    x = jnp.array([1.4, 1.5, 1.6, 2.5])
    np.testing.assert_array_equal(np.asarray(rounded_identity(x)), [1.0, 2.0, 2.0, 2.0])
    g = jax.grad(lambda v: jnp.sum(rounded_identity(v) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0)


def test_binarizer_module_shapes_and_range():
    b = Binarizer(out_channels=8)
    x = jnp.ones((2, 4, 4, 16))
    variables = b.init({"params": jax.random.PRNGKey(0), "binarize": jax.random.PRNGKey(1)}, x)
    y = b.apply(variables, x, rngs={"binarize": jax.random.PRNGKey(2)})
    assert y.shape == (2, 4, 4, 8)
    assert set(np.unique(np.asarray(y))) <= {-1.0, 1.0}
    # eval mode: deterministic, no rng needed
    y2 = b.apply(variables, x, True)
    y3 = b.apply(variables, x, True)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y3))


def test_binarizer_grouped():
    b = Binarizer(out_channels=8, groups=4)
    x = jnp.ones((1, 2, 2, 16))
    v = b.init({"params": jax.random.PRNGKey(0), "binarize": jax.random.PRNGKey(1)}, x)
    # grouped 1x1 conv kernel: (1, 1, in/groups, out)
    assert v["params"]["conv"]["kernel"].shape == (1, 1, 4, 8)


def test_s2hvq_round_trip_and_rate():
    m = S2HVQ(n_centers=10, center_size=5, sigma=50.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (7, 15))
    variables = m.init(jax.random.PRNGKey(1), x, 3)
    # hard encode is one-hot
    raw = m.apply(variables, x, 3, False, method=S2HVQ.encode)
    assert raw.shape == (7, 3, 10)
    np.testing.assert_allclose(np.asarray(raw.sum(-1)), 1.0, rtol=1e-6)
    # decode maps back to codebook rows
    dec = m.apply(variables, raw, method=S2HVQ.decode)
    assert dec.shape == (7, 15)
    cb = np.asarray(variables["params"]["codebook"])
    for row in np.asarray(dec).reshape(-1, 5):
        assert any(np.allclose(row, c) for c in cb)
    # soft encode is a distribution; pmf and cross-entropy behave
    soft = m.apply(variables, x, 3, True, method=S2HVQ.encode)
    pmf = S2HVQ.get_pmf(soft)
    assert abs(float(pmf.sum()) - 1.0) < 1e-5
    h = S2HVQ.get_cross_entropy(pmf, pmf)
    assert float(h) >= 0.0
    # invalid code_len rejected
    with pytest.raises(ValueError):
        m.apply(variables, x, 4, method=S2HVQ.encode)


def test_s2hvq_soft_hard_agree_at_high_sigma():
    m = S2HVQ(n_centers=4, center_size=2, sigma=1e4)
    x = jax.random.normal(jax.random.PRNGKey(2), (11, 8))
    variables = m.init(jax.random.PRNGKey(3), x, 4)
    soft = m.apply(variables, x, 4, True, method=S2HVQ.encode)
    hard = m.apply(variables, x, 4, False, method=S2HVQ.encode)
    np.testing.assert_array_equal(
        np.asarray(soft.argmax(-1)), np.asarray(hard.argmax(-1))
    )


def test_s2hvq_v2_mlp_scores():
    m = S2HVQV2(n_centers=6, center_size=3, sigma=10.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 12))
    variables = m.init(jax.random.PRNGKey(5), x, 4)
    y = m.apply(variables, x, 4)
    assert y.shape == (5, 12)
