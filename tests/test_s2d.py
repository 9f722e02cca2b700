"""Exactness tests for the space-to-depth conv transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdse_tpu.models.layers import instance_norm, reflect_pad
from jpdse_tpu.ops.s2d import (
    conv_s1_weights_to_s2d,
    conv_s2_weights_from_s2d,
    conv_valid,
    convT_s2_weights_to_s2d,
    depth_to_space,
    instance_norm_s2d,
    space_to_depth,
)


def test_s2d_round_trip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


@pytest.mark.parametrize("k", [3, 7])
def test_conv_s1_in_s2d_domain(rng, k):
    """reflect-pad + conv(k, s1) == s2d(conv') on the padded-s2d input."""
    cin, cout = 5, 6
    x = jnp.asarray(rng.normal(size=(2, 16, 24, cin)).astype(np.float32))
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1
    p = (k - 1) // 2
    direct = conv_valid(reflect_pad(x, p), jnp.asarray(w))

    xp = space_to_depth(reflect_pad(x, p))
    wp = jnp.asarray(conv_s1_weights_to_s2d(w))
    s2d_out = conv_valid(xp, wp)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(s2d_out)), np.asarray(direct), atol=1e-5
    )


def test_conv_s2_from_s2d_domain(rng):
    """zero-pad-1 + conv(3, s2) == conv'(s2d(padded), s1) in normal domain."""
    cin, cout = 4, 7
    x = jnp.asarray(rng.normal(size=(1, 16, 24, cin)).astype(np.float32))
    w = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    direct = conv_valid(xpad, jnp.asarray(w), stride=2)

    xp = space_to_depth(xpad)
    wp = jnp.asarray(conv_s2_weights_from_s2d(w))
    got = conv_valid(xp, wp)
    assert got.shape == direct.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct), atol=1e-5)


def test_convT_s2_to_s2d_domain(rng):
    """ConvTranspose(3, s2, p1, op1) == d2s(conv''(pad01(x), s1))."""
    from jpdse_tpu.models.layers import ConvTranspose

    cin, cout = 6, 5
    x = jnp.asarray(rng.normal(size=(2, 8, 12, cin)).astype(np.float32))
    m = ConvTranspose(features=cout, kernel_size=3, stride=2, padding=1, output_padding=1, use_bias=False)
    v = m.init(jax.random.PRNGKey(0), x)
    direct = m.apply(v, x)
    w = np.asarray(v["params"]["kernel"])  # (3,3,cin,cout)
    # our ConvTranspose correlates with the flipped kernel; the math in
    # convT_s2_weights_to_s2d is phrased on the flipped (conv-gradient) taps
    wp = jnp.asarray(convT_s2_weights_to_s2d(np.flip(w, axis=(0, 1))))
    xpad = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    got = depth_to_space(conv_valid(xpad, wp))
    assert got.shape == direct.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct), atol=1e-5)


def test_instance_norm_s2d_matches_fine(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 6)).astype(np.float32) * 2 + 1)
    want = instance_norm(x)
    got = depth_to_space(instance_norm_s2d(space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestTapFolds:
    """fold_w_taps / fold_hw_taps + matching weight reshapes == direct conv."""

    def test_fold_w_matches_direct(self):
        import numpy as np

        from jpdse_tpu.ops.s2d import (
            conv_valid,
            fold_w_taps,
            weights_fold_w,
        )

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 9, 13, 20)).astype(np.float32))
        w = rng.normal(size=(4, 4, 20, 8)).astype(np.float32)
        direct = conv_valid(x, jnp.asarray(w))
        folded = conv_valid(fold_w_taps(x, 4), jnp.asarray(weights_fold_w(w)))
        np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                                   rtol=1e-5, atol=1e-5)

    def test_fold_hw_matches_direct(self):
        import numpy as np

        from jpdse_tpu.ops.s2d import (
            conv_valid,
            fold_hw_taps,
            weights_fold_hw,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 9, 13, 3)).astype(np.float32))
        w = rng.normal(size=(4, 4, 3, 8)).astype(np.float32)
        direct = conv_valid(x, jnp.asarray(w))
        folded = conv_valid(
            fold_hw_taps(x, 4, 4), jnp.asarray(weights_fold_hw(w))
        )
        np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                                   rtol=1e-5, atol=1e-5)

    def test_tap_split_matches_direct(self):
        import numpy as np

        from jpdse_tpu.ops.s2d import (
            conv_tap_split,
            conv_valid,
            weights_tap_split,
        )

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 9, 13, 16)).astype(np.float32))
        w = rng.normal(size=(4, 4, 16, 12)).astype(np.float32)
        direct = conv_valid(x, jnp.asarray(w))
        split = conv_tap_split(x, jnp.asarray(weights_tap_split(w)), 4, 4)
        np.testing.assert_allclose(np.asarray(split), np.asarray(direct),
                                   rtol=1e-5, atol=1e-5)

    def test_tap_split_w_matches_direct(self):
        import numpy as np

        from jpdse_tpu.ops.s2d import (
            conv_tap_split_w,
            conv_valid,
            weights_tap_split_w,
        )

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 9, 13, 16)).astype(np.float32))
        w = rng.normal(size=(4, 4, 16, 18)).astype(np.float32)
        direct = conv_valid(x, jnp.asarray(w))
        split = conv_tap_split_w(x, jnp.asarray(weights_tap_split_w(w)), 4)
        np.testing.assert_allclose(np.asarray(split), np.asarray(direct),
                                   rtol=1e-5, atol=1e-5)
        # grouped variants: taps kept inside the kernel per group
        for group in (2, 4):
            gs = conv_tap_split_w(
                x, jnp.asarray(weights_tap_split_w(w, group)), 4, group
            )
            np.testing.assert_allclose(np.asarray(gs), np.asarray(direct),
                                       rtol=1e-5, atol=1e-5)


def test_instance_norm_s2d_large_mean_conditioning(monkeypatch):
    """JPDSE_NORM_SHIFT=1 keeps the variance estimate conditioned under
    large per-channel means (the default one-pass form cancels
    catastrophically in fp32 there, but costs 6% e2e — see the docstring).
    Compare against the fine-domain float64 reference."""
    import numpy as np

    monkeypatch.setenv("JPDSE_NORM_SHIFT", "1")
    from jpdse_tpu.ops.s2d import instance_norm_s2d, space_to_depth

    rng = np.random.default_rng(0)
    # mean/std ratio ~ 3000: naive one-pass fp32 loses ~all variance bits
    fine = (3000.0 + 0.5 * rng.normal(size=(2, 16, 32, 5))).astype(np.float32)
    ref64 = fine.astype(np.float64)
    m = ref64.mean(axis=(1, 2), keepdims=True)
    v = ref64.var(axis=(1, 2), keepdims=True)
    want = space_to_depth(
        jnp.asarray(((ref64 - m) / np.sqrt(v + 1e-5)).astype(np.float32))
    )
    got = instance_norm_s2d(space_to_depth(jnp.asarray(fine)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("hw", [(4, 4), (4, 10), (8, 12), (16, 10), (64, 128)])
def test_s2d_realign_pad3_bit_exact(rng, hw):
    """The one-pass grid re-alignment (channel-permuted shifted slices)
    equals d2s -> ReflectionPad2d(3) -> s2d element-for-element."""
    from jpdse_tpu.ops.s2d import s2d_realign_pad3

    h, w = hw
    y = jnp.asarray(rng.normal(size=(2, h // 2, w // 2, 4 * 5)).astype(np.float32))
    ref = space_to_depth(reflect_pad(depth_to_space(y), 3))
    np.testing.assert_array_equal(
        np.asarray(s2d_realign_pad3(y)), np.asarray(ref)
    )


def test_s2d_concat_interleave_matches_fine_concat(rng):
    """s2d_concat_interleave restores the global (sub, c) layout bit-exactly:
    interleave([s2d(t_i)]) == s2d(concat(t_i)) for mixed component widths."""
    from jpdse_tpu.ops.s2d import s2d_concat_interleave, space_to_depth

    comps = [
        jnp.asarray(rng.normal(size=(2, 8, 12, c)).astype(np.float32))
        for c in (5, 1, 3)
    ]
    want = space_to_depth(jnp.concatenate(comps, axis=-1))
    got = s2d_concat_interleave([space_to_depth(t) for t in comps])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # single component: identity
    one = space_to_depth(comps[0])
    np.testing.assert_array_equal(
        np.asarray(s2d_concat_interleave([one])), np.asarray(one)
    )


def test_jnp_weight_transforms_match_numpy(rng):
    """The differentiable (jnp) transform twins used by the fast TRAIN path
    must produce byte-identical layouts to the numpy originals."""
    from jpdse_tpu.ops import s2d

    w7 = rng.normal(size=(7, 7, 5, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(s2d.conv_s1_weights_to_s2d_jnp(jnp.asarray(w7))),
        s2d.conv_s1_weights_to_s2d(w7),
    )
    w3 = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(s2d.conv_s2_weights_from_s2d_nopad_jnp(jnp.asarray(w3))),
        s2d.conv_s2_weights_from_s2d_nopad(w3),
    )
    np.testing.assert_array_equal(
        np.asarray(s2d.convT_s2_weights_to_s2d_jnp(jnp.asarray(w3))),
        s2d.convT_s2_weights_to_s2d(w3),
    )
    wp = rng.normal(size=(4, 4, 8, 12)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(s2d.weights_tap_split_jnp(jnp.asarray(wp))),
        s2d.weights_tap_split(wp),
    )


def test_weights_tap_split_w_jnp_matches_numpy(rng):
    from jpdse_tpu.ops import s2d

    wp = rng.normal(size=(4, 4, 8, 28)).astype(np.float32)
    for group in (1, 2, 4):
        np.testing.assert_array_equal(
            np.asarray(s2d.weights_tap_split_w_jnp(jnp.asarray(wp), group)),
            s2d.weights_tap_split_w(wp, group),
        )
