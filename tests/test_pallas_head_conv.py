"""Golden tests for the VMEM-im2col head-conv kernel (ops/pallas/head_conv).

The kernel must equal conv_valid(xp, wp) up to float reassociation of the
16-tap sum, for every head geometry the fast trunks produce (netG/netE4label
kp=4 on 4x-channel s2d inputs; the interpret mode runs the real kernel body
on CPU). The caller contract under test: ho % 4 == 0 and
head_conv_extra_rows(ho) rows of bottom padding whose values must never
reach an output (the tests pad with NaN to prove it). The wiring test pins
the JPDSE_HEAD_PALLAS=1 _FastTrunk front against the default front on CPU
(off-TPU the mode falls back to the plain conv through a weight unfold —
that reshape round trip is what's under test there).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdse_tpu.ops.pallas.head_conv import (
    head_conv_extra_rows,
    head_conv_s2d_pallas,
)
from jpdse_tpu.ops.s2d import conv_valid, weights_fold_w


@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 13, 5, 8, 4),    # ho=8, odd widths/channels
        (1, 12, 12, 12, 16, 4),  # netE-like tiny channels
        (2, 8, 9, 3, 4, 2),      # kp=2 (down0 geometry)
        (1, 16, 35, 20, 8, 4),   # wider row
    ],
)
def test_head_conv_matches_conv_valid(shape):
    b, ho, wp_, c, n, kp = shape
    hp = ho + kp - 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, hp, wp_, c)).astype(np.float32))
    w = rng.normal(size=(kp, kp, c, n)).astype(np.float32)
    ref = conv_valid(x, jnp.asarray(w))
    wf = jnp.asarray(weights_fold_w(w).reshape(kp, kp * c, n))
    # pad the extra bottom rows with NaN: the kernel may fetch but must
    # never read them into an output
    extra = head_conv_extra_rows(ho, kp)
    xpad = jnp.pad(x, ((0, 0), (0, extra), (0, 0), (0, 0)),
                   constant_values=np.nan)
    got = head_conv_s2d_pallas(xpad, wf, kp=kp, ho=ho, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_pad3_s2d_extra_rows_prefix_exact():
    """The composed producer (realign.s2d_pad3_pallas with extra_rows) must
    match space_to_depth(reflect_pad(x, 3)) exactly on the real rows; the
    extra rows are fetch padding only."""
    from jpdse_tpu.models.layers import reflect_pad
    from jpdse_tpu.ops.pallas.realign import s2d_pad3_pallas
    from jpdse_tpu.ops.s2d import space_to_depth

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 5)).astype(np.float32))
    ref = space_to_depth(reflect_pad(x, 3))
    got = s2d_pad3_pallas(x, interpret=True, extra_rows=1)
    assert got.shape[1] == ref.shape[1] + 1
    np.testing.assert_array_equal(np.asarray(got[:, :-1]), np.asarray(ref))


def test_head_conv_rejects_untileable_rows():
    x = jnp.zeros((1, 9, 12, 4))
    wf = jnp.zeros((4, 16, 8))
    with pytest.raises(ValueError):
        head_conv_s2d_pallas(x, wf, kp=4, ho=6, interpret=True)


def test_fast_trunk_head_pallas_mode_matches_default():
    from jpdse_tpu.models.fast_codec import _FastTrunk
    from jpdse_tpu.models.generator import GlobalGenerator

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 16)).astype(np.float32))
    gen = GlobalGenerator(16, 3, 8, 2, 1, fused=False, dtype=jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)["params"]

    base = _FastTrunk(params, 2, 1, "none", jnp.float32)
    assert base.head_fold == "none"
    ref = base.front(base.weights, x)

    os.environ["JPDSE_HEAD_PALLAS"] = "1"
    try:
        fast = _FastTrunk(params, 2, 1, "none", jnp.float32)
        assert fast.head_fold == "pallas"
        assert fast.weights["head_w"].ndim == 3
        got = fast.front(fast.weights, x)
    finally:
        del os.environ["JPDSE_HEAD_PALLAS"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    # sharded trunks must keep the XLA conv (no GSPMD rule for pallas_call)
    os.environ["JPDSE_HEAD_PALLAS"] = "1"
    try:
        sharded = _FastTrunk(params, 2, 1, "none", jnp.float32, sharded=True)
        assert sharded.head_fold != "pallas"
    finally:
        del os.environ["JPDSE_HEAD_PALLAS"]
