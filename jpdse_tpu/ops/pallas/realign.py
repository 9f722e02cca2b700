"""Pallas TPU kernel: one-pass s2d grid re-alignment (ReflectionPad2d(3)).

Every fast trunk's back stage re-aligns the s2d grid before its 7x7 tail
conv: ``space_to_depth(reflect_pad(depth_to_space(y), 3))``. XLA lowers
that as two full-tensor HBM round trips (8.2 ms of the 27.4 ms netE4label
back stage at batch 8, 512x1024, v5e — `tools/bench_e4l_back.py`), and the
slice-concat re-expression is worse (15.2 ms: the C-sized channel-block
slices break 128-lane alignment). The movement itself is a fixed
permutation: because the pad is odd, output tap (pu, pv) is a shifted
(reflected at borders) row/col selection of input tap (1-pu, 1-pv). This
kernel emits each output row in one pass: the two source rows ride in via
BlockSpec index maps (row reflection is scalar arithmetic on the grid
index), and the column shuffle (shift + 1-2 reflected boundary columns)
is static VMEM slicing.

Bit-exact vs the composition (elements are only moved). Forward-only: the
fast inference path is the only consumer. Falls back to the jnp
composition off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pallas_realign_supported() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(ya_ref, yb_ref, o_ref):
    # ya: source row for the pu=0 output taps (input taps su=1)
    # yb: source row for the pu=1 output taps (input taps su=0)
    ws = ya_ref.shape[2]
    c = ya_ref.shape[3] // 4
    a = ya_ref[0, 0]  # (ws, 4c)
    b = yb_ref[0, 0]

    def cols_even(x):  # pv=0: cols [1, 0] + [0..ws) + [ws-2]
        return jnp.concatenate(
            [x[1:2], x[0:1], x, x[ws - 2 : ws - 1]], axis=0)

    def cols_odd(x):  # pv=1: cols [1] + [0..ws) + [ws-1, ws-2]
        return jnp.concatenate(
            [x[1:2], x, x[ws - 1 : ws], x[ws - 2 : ws - 1]], axis=0)

    o_ref[0, 0] = jnp.concatenate(
        [
            cols_even(a[:, 3 * c : 4 * c]),  # (pu0,pv0) <- tap (1,1)
            cols_odd(a[:, 2 * c : 3 * c]),   # (pu0,pv1) <- tap (1,0)
            cols_even(b[:, 1 * c : 2 * c]),  # (pu1,pv0) <- tap (0,1)
            cols_odd(b[:, 0 * c : 1 * c]),   # (pu1,pv1) <- tap (0,0)
        ],
        axis=1,
    )


def _reflect_fine(m, n_fine):
    m = jnp.where(m < 0, -m, m)
    return jnp.where(m > n_fine - 1, 2 * (n_fine - 1) - m, m)


def s2d_realign_pad3_pallas(
    y: jax.Array, interpret: bool = False, extra_rows: int = 0
) -> jax.Array:
    """(B, hs, ws, 4C) s2d tensor -> (B, hs+3+extra_rows, ws+3, 4C); rows
    [0, hs+3) equal ``space_to_depth(reflect_pad(depth_to_space(y), 3))``
    bit-for-bit. ``extra_rows`` appends deeper-reflected rows as fetch
    padding for Pallas consumers whose row views over-fetch
    (ops/pallas/head_conv.py); they are never part of the result."""
    bsz, hs, ws, c4 = y.shape
    assert hs >= 2 and ws >= 2 and c4 % 4 == 0

    def row_a(bi, j):  # src s2d row for pu=0: fine row 2j-3, tap su=1
        m = _reflect_fine(2 * j - 3, 2 * hs)
        return (bi, (m - 1) // 2, 0, 0)

    def row_b(bi, j):  # src s2d row for pu=1: fine row 2j-2, tap su=0
        m = _reflect_fine(2 * j - 2, 2 * hs)
        return (bi, m // 2, 0, 0)

    hp = hs + 3 + extra_rows
    assert 2 * hp - 3 <= 2 * (2 * hs - 1) + 1, "extra_rows exceeds reflect range"
    return pl.pallas_call(
        _kernel,
        grid=(bsz, hp),
        in_specs=[
            pl.BlockSpec((1, 1, ws, c4), row_a),
            pl.BlockSpec((1, 1, ws, c4), row_b),
        ],
        out_specs=pl.BlockSpec((1, 1, ws + 3, c4), lambda bi, j: (bi, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, ws + 3, c4), y.dtype),
        interpret=interpret,
    )(y, y)


def _front_kernel(xa_ref, xb_ref, o_ref):
    # xa: fine input row for the pu=0 output taps (fine row 2j-3 reflected)
    # xb: fine input row for the pu=1 output taps (fine row 2j-2 reflected)
    w = xa_ref.shape[2]
    ws = w // 2
    c = xa_ref.shape[3]

    def split(x):  # (W, C) -> even / odd fine-column subsequences (ws, C)
        x3 = x.reshape(ws, 2, c)
        return x3[:, 0, :], x3[:, 1, :]

    a_even, a_odd = split(xa_ref[0, 0])
    b_even, b_odd = split(xb_ref[0, 0])

    # same boundary patterns as the back-stage kernel: the pv=0 output taps
    # read the odd fine columns (cols [1, 0] + all + [ws-2]) and the pv=1
    # taps the even fine columns (cols [1] + all + [ws-1, ws-2])
    def cols_even(x):
        return jnp.concatenate(
            [x[1:2], x[0:1], x, x[ws - 2 : ws - 1]], axis=0)

    def cols_odd(x):
        return jnp.concatenate(
            [x[1:2], x, x[ws - 1 : ws], x[ws - 2 : ws - 1]], axis=0)

    o_ref[0, 0] = jnp.concatenate(
        [
            cols_even(a_odd),   # (pu0,pv0) <- fine (2j-3, 2k-3)
            cols_odd(a_even),   # (pu0,pv1) <- fine (2j-3, 2k-2)
            cols_even(b_odd),   # (pu1,pv0) <- fine (2j-2, 2k-3)
            cols_odd(b_even),   # (pu1,pv1) <- fine (2j-2, 2k-2)
        ],
        axis=1,
    )


def s2d_pad3_pallas(
    x: jax.Array, interpret: bool = False, extra_rows: int = 0
) -> jax.Array:
    """(B, H, W, C) normal-domain tensor -> (B, H/2+3+extra_rows, W/2+3, 4C);
    rows [0, H/2+3) equal ``space_to_depth(reflect_pad(x, 3))`` bit-for-bit.

    The fast trunks' FRONT stages enter the s2d domain through exactly that
    composition (models/fast_codec.py front); XLA lowers it as two
    full-tensor HBM round trips (pad copy + relayout). This kernel reads
    each fine input row once and writes each padded s2d output row once —
    the front-side sibling of the back-stage grid re-alignment above.

    ``extra_rows`` appends further (deeper-reflected) rows so a Pallas
    consumer whose row views over-fetch (ops/pallas/head_conv.py needs
    head_conv_extra_rows) can read in bounds; their values are never part
    of the mathematical result."""
    bsz, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0 and h >= 4 and w >= 4

    def row_a(bi, j):  # fine source row for the pu=0 taps
        return (bi, _reflect_fine(2 * j - 3, h), 0, 0)

    def row_b(bi, j):  # fine source row for the pu=1 taps
        return (bi, _reflect_fine(2 * j - 2, h), 0, 0)

    hs, ws = h // 2, w // 2
    hp = hs + 3 + extra_rows
    assert 2 * hp - 3 <= 2 * (h - 1) + 1, "extra_rows exceeds reflect range"
    return pl.pallas_call(
        _front_kernel,
        grid=(bsz, hp),
        in_specs=[
            pl.BlockSpec((1, 1, w, c), row_a),
            pl.BlockSpec((1, 1, w, c), row_b),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ws + 3, 4 * c), lambda bi, j: (bi, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, ws + 3, 4 * c), x.dtype),
        interpret=interpret,
    )(x, x)
