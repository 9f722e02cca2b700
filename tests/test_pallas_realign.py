"""Interpret-mode goldens for the Pallas grid re-alignment kernels.

The kernels only run natively on TPU (models/fast_codec.py gates them on
the backend); ``interpret=True`` executes the same kernel body through the
Pallas interpreter on CPU so CI pins their element movement bit-exactly
against the jnp compositions they replace. On-device equality was
additionally array_equal-checked on the v5e (PERF.md round 3).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jpdse_tpu.ops.pallas.realign import (
    s2d_pad3_pallas,
    s2d_realign_pad3_pallas,
)
from jpdse_tpu.models.layers import reflect_pad
from jpdse_tpu.ops.s2d import depth_to_space, space_to_depth


@pytest.mark.parametrize("hw,c", [((8, 12), 5), ((16, 10), 4), ((64, 128), 8)])
def test_back_realign_kernel_bit_exact(rng, hw, c):
    h, w = hw
    y = jnp.asarray(
        rng.normal(size=(2, h // 2, w // 2, 4 * c)).astype(np.float32)
    )
    ref = space_to_depth(reflect_pad(depth_to_space(y), 3))
    got = s2d_realign_pad3_pallas(y, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize(
    "hw,c", [((8, 12), 3), ((16, 10), 7), ((64, 128), 39)]
)
def test_front_pad_s2d_kernel_bit_exact(rng, hw, c):
    """The one-pass front kernel equals ReflectionPad2d(3) -> s2d, including
    the odd channel counts the trunk inputs actually have (39 = image+
    one-hot+edge assembly)."""
    h, w = hw
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    ref = space_to_depth(reflect_pad(x, 3))
    got = s2d_pad3_pallas(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_front_pad_s2d_kernel_bf16(rng):
    x = jnp.asarray(
        rng.normal(size=(1, 16, 20, 6)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = space_to_depth(reflect_pad(x, 3))
    got = s2d_pad3_pallas(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
