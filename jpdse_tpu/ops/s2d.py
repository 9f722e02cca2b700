"""Space-to-depth conv transforms — mathematically exact re-layouts of the
network's high-resolution, few-channel layers into MXU-friendly form.

Why: on TPU, convs contract over input channels on the MXU's 128-wide lanes.
The codec's full-resolution layers (7x7 head conv on ~36-40 channels, 64-ch
stride-2 downsample, final ConvTranspose + 7x7 tail) run at 15-40 TFLOP/s
while the deep 1024-channel res blocks hit ~160 TFLOP/s (measured, v5e).
Re-expressing those layers in the space-to-depth domain ((H, W, C) stored as
(H/2, W/2, 4C), channel index = (su*2+sv)*C + c) lifts the contraction to
>=128 channels and quarters the spatial extent — same math, bit-equal
results up to float reassociation.

Transforms (all verified against the direct computation in
tests/test_s2d.py):
  * ``conv_s1_weights_to_s2d``  — odd-k stride-1 conv on a pre-padded input,
    computed entirely in the s2d domain (k' = k//2 + 1).
  * ``conv_s2_weights_from_s2d`` — 3x3 stride-2 conv consuming an s2d input
    and producing a normal-domain output (k' = 2): the downsample exits the
    s2d domain for free.
  * ``convT_s2_weights_to_s2d`` — 3x3 stride-2 ConvTranspose(p=1, op=1)
    producing its 2x-upsampled output directly in s2d form (k' = 2).
  * ``instance_norm_s2d`` — InstanceNorm with statistics over the original
    (H, W) extent, i.e. jointly over the 4 sub-position channel groups.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (su*2 + sv)*C + c."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y: jax.Array) -> jax.Array:
    """Inverse of space_to_depth."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h2, w2, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h2 * 2, w2 * 2, c)


def s2d_realign_pad3(y: jax.Array) -> jax.Array:
    """One-pass equivalent of ``space_to_depth(reflect_pad(depth_to_space(y), 3))``.

    The back stages of every fast trunk re-align the s2d grid before the
    7x7 tail conv: depth_to_space -> ReflectionPad2d(3) -> space_to_depth.
    Composed naively that is two full-tensor HBM round trips (measured
    7.98 ms of the 27.4 ms netE4label back stage at batch 8 full-res on
    v5e — `tools/bench_e4l_back.py`). Because the pad is odd, every output
    tap (pu, pv) is a fixed SHIFTED SLICE of one input tap (su, sv) =
    (1-pu, 1-pv): fine row m = 2J-3+pu has parity su = 1-pu and lands in
    input s2d row (m-su)//2, so the whole re-alignment is a channel-block
    permutation of shifted slices plus 1-2 reflected boundary rows per
    side — one fused copy pass for XLA instead of two.

    Bit-exact: elements are only moved, never computed.
    """
    b, hs, ws, c4 = y.shape
    c = c4 // 4
    blk = y.reshape(b, hs, ws, 4, c)
    outs = []
    for pu in range(2):
        for pv in range(2):
            t = blk[:, :, :, (1 - pu) * 2 + (1 - pv), :]
            # rows: pu=0 -> src tap su=1, rows [1, 0] + [0..hs) + [hs-2]
            #       pu=1 -> src tap su=0, rows [1] + [0..hs) + [hs-1, hs-2]
            if pu == 0:
                head, tail = t[:, 1::-1], t[:, hs - 2 : hs - 1]
            else:
                # flip(t[hs-2:hs]) == rows [hs-1, hs-2]; a negative-step
                # slice t[hs-1:hs-3:-1] breaks at hs == 2 (stop wraps)
                head, tail = t[:, 1:2], jnp.flip(t[:, hs - 2 : hs], axis=1)
            t = jnp.concatenate([head, t, tail], axis=1)
            if pv == 0:
                headw, tailw = t[:, :, 1::-1], t[:, :, ws - 2 : ws - 1]
            else:
                headw, tailw = t[:, :, 1:2], jnp.flip(t[:, :, ws - 2 : ws], axis=2)
            t = jnp.concatenate([headw, t, tailw], axis=2)
            outs.append(t)
    return jnp.concatenate(outs, axis=-1)


def s2d_concat_interleave(comps) -> jax.Array:
    """Channel-concat per-component s2d tensors into the GLOBAL s2d layout.

    Given fine-domain tensors t_i of widths c_i, ``space_to_depth(concat(t_i))``
    has channel index (sub, c_fine) over the concatenated width — which is NOT
    the block concat of the individually-converted ``space_to_depth(t_i)``
    (each sub-major over its own c_i). This interleaves the per-component
    blocks back into the global order, bit-exactly:

        s2d_concat_interleave([space_to_depth(t) for t in ts])
            == space_to_depth(jnp.concatenate(ts, axis=-1))

    Why it exists (PERF.md front-stage ledger): the fast path's trunk inputs
    can be *born* in the s2d domain (one-hot of an s2d'd label map, an
    upstream trunk's pre-depth_to_space tail output), skipping the
    full-resolution relayout copies entirely; this is the one data-movement
    step that stitches those components into the layout the s2d head-conv
    weights (conv_s1_weights_to_s2d) expect.

    Measured (PERF.md round-3c): the end-to-end mode REGRESSES 38.33 ->
    36.32 MP/s/chip at the bench default — this stitch is a 4*len(comps)-way
    strided slice-concat at full resolution that materializes where the
    fine-domain assembly was a contiguous copy XLA fused into the pad+s2d
    producer. Kept (with the deploy decoder's layout algebra pinned by
    bit-exactness tests) as the recorded negative behind JPDSE_S2D_E2E.
    """
    if len(comps) == 1:
        return comps[0]
    slices = []
    for sub in range(4):
        for t in comps:
            c = t.shape[-1] // 4
            slices.append(t[..., sub * c : (sub + 1) * c])
    return jnp.concatenate(slices, axis=-1)


def conv_s1_weights_to_s2d(w: np.ndarray) -> np.ndarray:
    """(k, k, Cin, Cout) stride-1 odd-k conv -> s2d-domain weights
    (k', k', 4Cin, 4Cout) with k' = k//2 + 1.

    Contract: the fine input is already padded by p = (k-1)/2 per side (any
    padding mode) and converted with space_to_depth; a VALID conv with the
    returned kernel yields the s2d form of the fine conv output.
    Derivation: fine output (2i+di, 2j+dj) reads padded fine rows
    [2i+di, 2i+di+k); padded fine row 2(i+u') + su maps to tap
    u = 2u' + su - di when 0 <= u < k.
    """
    k, k2, cin, cout = w.shape
    assert k == k2 and k % 2 == 1
    kp = k // 2 + 1
    wp = np.zeros((kp, kp, 4 * cin, 4 * cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            for su in range(2):
                for sv in range(2):
                    for up in range(kp):
                        u = 2 * up + su - di
                        if not (0 <= u < k):
                            continue
                        for vp in range(kp):
                            v = 2 * vp + sv - dj
                            if not (0 <= v < k):
                                continue
                            ci = (su * 2 + sv)  # input sub-position group
                            co = (di * 2 + dj)
                            wp[up, vp, ci * cin : (ci + 1) * cin,
                               co * cout : (co + 1) * cout] = w[u, v]
    return wp


def conv_s2_weights_from_s2d(w: np.ndarray) -> np.ndarray:
    """(3, 3, Cin, Cout) stride-2 pad-1 conv -> (2, 2, 4Cin, Cout) weights
    consuming an s2d input and producing the normal-domain output.

    Contract: the fine input is padded by 1 per side (making H+2 even) and
    space_to_depth'd; a VALID stride-1 conv with the returned kernel equals
    the fine stride-2 conv. Padded fine row 2(i+u') + su maps to tap
    t = 2u' + su (t < 3)."""
    k, k2, cin, cout = w.shape
    assert k == 3 and k2 == 3
    wp = np.zeros((2, 2, 4 * cin, cout), w.dtype)
    for su in range(2):
        for sv in range(2):
            for up in range(2):
                t = 2 * up + su
                if t >= 3:
                    continue
                for vp in range(2):
                    s = 2 * vp + sv
                    if s >= 3:
                        continue
                    ci = su * 2 + sv
                    wp[up, vp, ci * cin : (ci + 1) * cin, :] = w[t, s]
    return wp


def conv_s2_weights_from_s2d_nopad(w: np.ndarray) -> np.ndarray:
    """Like :func:`conv_s2_weights_from_s2d`, but for an *unpadded* s2d input
    plus an explicit (1, 0) zero pad on each s2d spatial dim.

    out[i] reads fine rows [2i-1, 2i+2): fine 2i-1 = s2d row i-1 / su=1;
    fine 2i, 2i+1 = s2d row i / su=0,1 — a k'=2 window over s2d rows
    [i-1, i]: w''[0, su=1] = w[0]; w''[1, su=0] = w[1]; w''[1, su=1] = w[2].
    """
    k, k2, cin, cout = w.shape
    assert k == 3 and k2 == 3
    taps = {(0, 1): 0, (1, 0): 1, (1, 1): 2}  # (u', su) -> fine tap
    wp = np.zeros((2, 2, 4 * cin, cout), w.dtype)
    for (up, su), t in taps.items():
        for (vp, sv), s in taps.items():
            ci = su * 2 + sv
            wp[up, vp, ci * cin : (ci + 1) * cin, :] = w[t, s]
    return wp


def convT_s2_weights_to_s2d(w: np.ndarray) -> np.ndarray:
    """(3, 3, Cin, Cout) ConvTranspose(stride=2, pad=1, output_padding=1)
    weights (our HWIO layout) -> (2, 2, Cin, 4 Cout) weights producing the
    2x-upsampled output directly in s2d form.

    Contract: ``w`` is the effective *correlation* kernel g (for our
    ConvTranspose module that is ``flip(params['kernel'])``). Pad the input by
    (0, 1) per spatial dim (one trailing zero row/col) and run a VALID
    stride-1 conv. Derivation (1-D, from y[p] = sum_t g[t] d[p+t-1] over the
    2x-dilated input d): di=0 -> g[1] x[i]; di=1 -> g[0] x[i] + g[2] x[i+1].
    """
    k, k2, cin, cout = w.shape
    assert k == 3 and k2 == 3
    # 1-D mapping: list of (u', tap) per parity di
    taps = {0: [(0, 1)], 1: [(0, 0), (1, 2)]}
    wp = np.zeros((2, 2, cin, 4 * cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            co = di * 2 + dj
            for up, u in taps[di]:
                for vp, v in taps[dj]:
                    wp[up, vp, :, co * cout : (co + 1) * cout] += w[u, v]
    return wp


# ---------------------------------------------------------------------------
# Differentiable (jnp) twins of the weight transforms, for the fast TRAIN
# path (models/fast_train.py): the transforms run INSIDE the jitted step on
# live parameters, so gradients flow back through them to the standard-layout
# params (they are exact linear re-layouts — pure stack/concat of slices and
# zeros). Layouts pinned equal to the numpy versions by tests/test_s2d.py.
# ---------------------------------------------------------------------------

def conv_s1_weights_to_s2d_jnp(w: jax.Array) -> jax.Array:
    """jnp twin of :func:`conv_s1_weights_to_s2d` (same output layout)."""
    k, k2, cin, cout = w.shape
    assert k == k2 and k % 2 == 1
    kp = k // 2 + 1
    zeros = jnp.zeros((cin, cout), w.dtype)

    def entry(up, vp, su, sv, di, dj):
        u = 2 * up + su - di
        v = 2 * vp + sv - dj
        if 0 <= u < k and 0 <= v < k:
            return w[u, v]
        return zeros

    rows = []
    for up in range(kp):
        cols = []
        for vp in range(kp):
            # (4cin, 4cout) block: ci-major rows of co-major columns
            blk = jnp.concatenate(
                [
                    jnp.concatenate(
                        [
                            entry(up, vp, su, sv, di, dj)
                            for di in range(2)
                            for dj in range(2)
                        ],
                        axis=1,
                    )
                    for su in range(2)
                    for sv in range(2)
                ],
                axis=0,
            )
            cols.append(blk)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def conv_s2_weights_from_s2d_nopad_jnp(w: jax.Array) -> jax.Array:
    """jnp twin of :func:`conv_s2_weights_from_s2d_nopad`."""
    k, k2, cin, cout = w.shape
    assert k == 3 and k2 == 3
    taps = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    zeros = jnp.zeros((cin, cout), w.dtype)
    rows = []
    for up in range(2):
        cols = []
        for vp in range(2):
            blk = jnp.concatenate(
                [
                    w[taps[(up, su)], taps[(vp, sv)]]
                    if (up, su) in taps and (vp, sv) in taps
                    else zeros
                    for su in range(2)
                    for sv in range(2)
                ],
                axis=0,
            )
            cols.append(blk)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def convT_s2_weights_to_s2d_jnp(w: jax.Array) -> jax.Array:
    """jnp twin of :func:`convT_s2_weights_to_s2d` (``w`` is the effective
    correlation kernel, i.e. flip(params) for our ConvTranspose)."""
    k, k2, cin, cout = w.shape
    assert k == 3 and k2 == 3
    taps = {0: {0: 1}, 1: {0: 0, 1: 2}}  # di -> {u' -> fine tap}
    zeros = jnp.zeros((cin, cout), w.dtype)
    rows = []
    for up in range(2):
        cols = []
        for vp in range(2):
            blk = jnp.concatenate(
                [
                    w[taps[di][up], taps[dj][vp]]
                    if (up in taps[di] and vp in taps[dj])
                    else zeros
                    for di in range(2)
                    for dj in range(2)
                ],
                axis=1,
            )
            cols.append(blk)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def weights_tap_split_jnp(wp: jax.Array) -> jax.Array:
    """jnp twin of :func:`weights_tap_split` (pure transpose+reshape)."""
    kh, kw, cin, cout = wp.shape
    return wp.transpose(2, 0, 1, 3).reshape(cin, kh * kw * cout)


def weights_tap_split_w_jnp(wp: jax.Array, group: int = 1) -> jax.Array:
    """jnp twin of :func:`weights_tap_split_w` (stack/concat of slices)."""
    kh, kw, cin, cout = wp.shape
    assert kw % group == 0
    ng = kw // group
    return jnp.stack(
        [
            jnp.concatenate([wp[:, g * group + s] for g in range(ng)], axis=-1)
            for s in range(group)
        ],
        axis=1,
    )


def fold_w_taps(x: jax.Array, kw: int) -> jax.Array:
    """(B, H, W, C) -> (B, H, W-kw+1, kw*C): stack the kw width-shifted views
    along channels, so a (kh, kw) VALID conv becomes a (kh, 1) VALID conv with
    kw*C input channels.

    Why: the MXU contracts over 128-wide lane groups; a conv's per-tap
    contraction of C=160 channels pads to 256 lanes (62.5% useful — exactly
    the measured 98/158 TFLOP/s of the s2d head conv). Folding the width taps
    into channels makes the per-tap K = kw*C (640 for the flagship head =
    5x128, 100% useful) at the cost of one bandwidth-bound relayout."""
    w_out = x.shape[2] - kw + 1
    return jnp.concatenate([x[:, :, v : v + w_out, :] for v in range(kw)], axis=-1)


def fold_hw_taps(x: jax.Array, kh: int, kw: int) -> jax.Array:
    """(B, H, W, C) -> (B, H-kh+1, W-kw+1, kh*kw*C): full im2col fold — the
    conv becomes a 1x1 conv (single matmul with K = kh*kw*C). Materializes
    kh*kw copies of the input, so only worth it for tiny C (the visual
    encoder's 12-channel s2d head: K 12 -> 192)."""
    h_out = x.shape[1] - kh + 1
    w_out = x.shape[2] - kw + 1
    return jnp.concatenate(
        [
            x[:, u : u + h_out, v : v + w_out, :]
            for u in range(kh)
            for v in range(kw)
        ],
        axis=-1,
    )


def weights_fold_w(wp: np.ndarray) -> np.ndarray:
    """(kh, kw, Cin, Cout) -> (kh, 1, kw*Cin, Cout) matching fold_w_taps's
    channel layout (v-major: folded channel = v*Cin + c)."""
    kh, kw, cin, cout = wp.shape
    return wp.reshape(kh, 1, kw * cin, cout)


def weights_fold_hw(wp: np.ndarray) -> np.ndarray:
    """(kh, kw, Cin, Cout) -> (1, 1, kh*kw*Cin, Cout) matching fold_hw_taps
    ((u, v)-major: folded channel = (u*kw + v)*Cin + c)."""
    kh, kw, cin, cout = wp.shape
    return wp.reshape(1, 1, kh * kw * cin, cout)


def weights_tap_split(wp: np.ndarray) -> np.ndarray:
    """(kh, kw, Cin, Cout) -> (Cin, kh*kw*Cout) for the tap-split conv
    decomposition (see :func:`conv_tap_split`): output channel
    (u*kw + v)*Cout + co holds tap (u, v)'s contribution."""
    kh, kw, cin, cout = wp.shape
    return wp.transpose(2, 0, 1, 3).reshape(cin, kh * kw * cout)


def conv_tap_split(x: jax.Array, w1: jax.Array, kh: int, kw: int) -> jax.Array:
    """VALID conv computed as a 1x1 conv over all taps + a fused shift-add.

    Why: the MXU pads conv output channels to 128 lanes, so a tail conv with
    12 s2d outputs runs at ~9% N-utilization (~10.5 TFLOP/s measured). With
    ``w1 = weights_tap_split(w)`` the matmul produces kh*kw*Cout channels
    (192 for the flagship tail — MXU-efficient), and the conv's spatial
    accumulation becomes kh*kw shifted slice-adds (one bandwidth-bound
    fusion). Accumulation over taps is fp32.
    """
    b, hp, wp_, k = x.shape
    cout = w1.shape[-1] // (kh * kw)
    z = jax.lax.dot_general(
        x, w1, (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ho, wo = hp - kh + 1, wp_ - kw + 1
    out = jnp.zeros((b, ho, wo, cout), jnp.float32)
    for u in range(kh):
        for v in range(kw):
            t = (u * kw + v) * cout
            out = out + z[:, u : u + ho, v : v + wo, t : t + cout]
    return out.astype(x.dtype)


def weights_tap_split_w(wp: np.ndarray, group: int = 1) -> np.ndarray:
    """(kh, kw, Cin, Cout) -> (kh, group, Cin, (kw/group)*Cout) for the
    width tap-split (see :func:`conv_tap_split_w`). ``group`` width taps are
    kept INSIDE the conv kernel; the kw/group groups split into output
    channels (group block g holds taps [g*group, (g+1)*group) at kernel
    positions 0..group-1). group=1 is the original per-tap split; group=kw
    is the direct conv."""
    kh, kw, cin, cout = wp.shape
    assert kw % group == 0
    ng = kw // group
    # output channel g*Cout + co <- taps g*group..g*group+group-1
    out = np.zeros((kh, group, cin, ng * cout), wp.dtype)
    for g in range(ng):
        for s in range(group):
            out[:, s, :, g * cout : (g + 1) * cout] = wp[:, g * group + s]
    return out


def conv_tap_split_w(
    x: jax.Array, w1: jax.Array, kw: int, group: int = 1
) -> jax.Array:
    """VALID conv as a (kh, group) conv over width-tap groups + fused
    shift-add over the kw/group groups.

    The partial split for tails whose Cout is large enough that the full
    16-way split (:func:`conv_tap_split`) would blow up memory but still
    pads badly to 128 output lanes (netE4label: 144 -> 56% useful; group=1
    splits N to 4*144 = 576 -> 90%; group=2 to 288 -> 75% with half the
    intermediate-z HBM traffic). Accumulation over groups is fp32.
    """
    ng = kw // group
    cout = w1.shape[-1] // ng
    z = conv_valid(x, w1)  # (B, Ho, Wp - group + 1, ng*Cout)
    wo = z.shape[2] - (kw - group)
    out = jnp.zeros(z.shape[:2] + (wo, cout), jnp.float32)
    for g in range(ng):
        t = g * cout
        off = g * group
        out = out + z[:, :, off : off + wo, t : t + cout].astype(jnp.float32)
    return out.astype(x.dtype)


def instance_norm_s2d(
    x: jax.Array, eps: float = 1e-5, use_shift: "bool | None" = None
) -> jax.Array:
    """InstanceNorm over the *fine* (H, W) extent of an s2d tensor: stats are
    shared across the 4 sub-position groups of each original channel.

    Implemented with per-channel moments reduced over (H, W) first, so the
    phase-group combination happens on tiny (B, 4, C) stat tensors — no
    (B, H, W, 4, C) relayout of the activation itself (that 5-D reshape costs
    a full HBM round trip on TPU).

    Conditioning note: the one-pass E[x^2] - mean^2 loses fp32 bits when
    |mean|/std is large (catastrophic cancellation). JPDSE_NORM_SHIFT=1
    subtracts a per-fine-channel SAMPLE of the data first (same shift for
    every element pooled into one stat, so the variance is mathematically
    unchanged), dropping the conditioning ratio to |mean - x0|/std ~ O(1) —
    but it breaks XLA's fusion of the stats pass and measures 32.0 vs 33.9
    MP/s e2e (v5e, batch 16). Default OFF: trunk activations sit right
    after an InstanceNorm'd conv, where |mean|/std is O(10) and the fp32
    error is ~1e-12 relative (validated end-to-end at ~1e-7 dB vs the torch
    fp32 stack, BASELINE.md); enable the shift for pathological inputs.

    ``use_shift``: explicit selection (config.FastPathConfig.norm_shift,
    threaded by the fast-path trunks); None falls back to the env var."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x32 = x.astype(jnp.float32)
    n = h * w * 4
    if use_shift is None:
        use_shift = os.environ.get("JPDSE_NORM_SHIFT", "0") == "1"
    if use_shift:
        shift = jax.lax.stop_gradient(x32[:, :1, :1, :c])  # (b, 1, 1, c)
        d = x32 - jnp.tile(shift, (1, 1, 1, 4))
    else:
        shift = None
        d = x32
    s1 = jnp.sum(d, axis=(1, 2)).reshape(b, 4, c).sum(axis=1)  # (b, c)
    s2 = jnp.sum(d * d, axis=(1, 2)).reshape(b, 4, c).sum(axis=1)
    mean_d = s1 / n
    var = jnp.maximum(s2 / n - mean_d * mean_d, 0.0)
    mean = mean_d if shift is None else mean_d + shift[:, 0, 0, :]
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]
    rstd4 = jnp.tile(jax.lax.rsqrt(var + eps), (1, 4))[:, None, None, :]
    return ((x32 - mean4) * rstd4).astype(x.dtype)


def conv_valid(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(0, 0), (0, 0)], dimension_numbers=dn
    )
