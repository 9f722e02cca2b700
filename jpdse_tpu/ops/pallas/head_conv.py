"""Pallas TPU kernel: the s2d head conv with the im2col fold done in VMEM.

The fast path's 7x7 head convs run as k'=4 VALID convs in the s2d domain
(ops/s2d.py conv_s1_weights_to_s2d). Measured on v5e they sit at ~98 of the
~158 TFLOP/s practical bf16 ceiling, and the gap is the MXU K-tile padding
of the per-tap contraction: the flagship head contracts K = 156-160
channels per tap, which runs as two 128-deep MXU passes (~62% useful;
netE4label's K = 148 predicts its measured front time the same way).
Folding taps into one contraction fixes the alignment — but doing the fold
in HBM costs a duplicated relayout that eats the win (PERF.md: XLA-level
fold_hw_taps measured netG front 27.0 vs 20.8 ms; the HBM im2col matmul is
A-streaming-bound at 55 TFLOP/s). This kernel folds in VMEM, where the
duplication is free of HBM traffic.

Shape of the kernel (v2): each grid step emits BH=4 output rows. The BH+3
source rows ride in as two BH-row views of the same input (BlockSpec index
maps i and i+1 — the realign-kernel trick) and are stitched into a VMEM
scratch; for each of the kp kernel rows dy, the kp width taps are copied
into a (BH, Wo, kp*C) scratch (K = 4C = 624 for the flagship: 97.5% of 5
K-tiles useful) and contracted against that row's (kp*C, N) weights
(ops/s2d.py weights_fold_w layout), accumulating in fp32.

v1 of this kernel emitted ONE row per grid step with the full 16-tap fold
(K = 16C): measured netG front 24.2 ms vs the XLA conv's 20.8 — per-step
overhead dominated (the netE trunk, whose per-step data is 13x smaller,
still took 12.8 ms ≈ 2048 steps x ~6 us), so v2 cuts grid steps 4x and
K-tiles per dot from ~20 to 5.

Accumulation is fp32 (preferred_element_type), like XLA's bf16 conv.
Equal to conv_valid(xp, w) up to float reassociation of the tap sum
(golden-tested in tests/test_pallas_head_conv.py). Forward-only: the fast
inference path is the only consumer. Reference geometry:
/root/reference/ctu/models/pix2pixHD_networks/networks.py:210 (the 7x7
ReflectionPad head conv this ultimately computes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 4  # output rows per grid step


def pallas_head_conv_supported() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def head_conv_extra_rows(ho: int, kp: int = 4, bh: int = BH) -> int:
    """Extra (bottom) input rows the kernel needs beyond the valid-conv
    minimum, so the second row view's last block stays in bounds:
    Hp must reach ceil(ho/bh)*bh + bh; the natural Hp is ho + kp - 1."""
    n_tiles = -(-ho // bh)
    return max(0, (n_tiles + 1) * bh - (ho + kp - 1))


def _make_kernel(kp: int, bh: int, bq: int, wo: int, cin: int):
    def _kernel(va_ref, vb_ref, w_ref, o_ref, xin_ref, a_ref):
        # va/vb: (1, bh, Wp, C) row blocks i and i+1; w: (kp, kp*C, N)
        # xin: (bh + kp - 1, Wp, C) stitched rows; a: (bq, wo, kp*C).
        # The bh output rows are emitted in sub-blocks of bq so the fold
        # scratch + fp32 accumulator stay inside the 16M scoped-VMEM limit
        # (bq == bh measured 18.6M at the flagship shape — compile OOM).
        xin_ref[0:bh] = va_ref[0]
        xin_ref[bh : bh + kp - 1] = vb_ref[0, 0 : kp - 1]
        for q0 in range(0, bh, bq):
            acc = None
            for dy in range(kp):
                for dx in range(kp):
                    a_ref[:, :, dx * cin : (dx + 1) * cin] = xin_ref[
                        q0 + dy : q0 + dy + bq, dx : dx + wo, :
                    ]
                p = jax.lax.dot_general(
                    a_ref[:],
                    w_ref[dy],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = p if acc is None else acc + p
            o_ref[0, q0 : q0 + bq] = acc.astype(o_ref.dtype)

    return _kernel


def head_conv_s2d_pallas(
    xp: jax.Array,
    w_folded: jax.Array,
    kp: int = 4,
    ho: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """VALID (kp, kp) conv of ``xp`` (B, Hp, Wp, C) against w-folded weights
    ``w_folded`` (kp, kp*C, N) — ``weights_fold_w(wp).reshape(kp, kp*C, N)``
    of the s2d kernel wp (kp, kp, C, N). Returns (B, ho, Wp-kp+1, N).

    ``ho`` defaults to Hp - kp + 1; pass it explicitly when ``xp`` carries
    :func:`head_conv_extra_rows` rows of bottom padding (their values are
    never read into an output).

    No GSPMD partitioning rule — callers must keep it off sharded tensors
    (models/fast_codec.py gates on ``sharded`` exactly like the realign
    kernel).
    """
    bsz, hp, wp_, c = xp.shape
    kdy, ktap, n = w_folded.shape
    assert kdy == kp and ktap == kp * c, (w_folded.shape, kp, c)
    wo = wp_ - kp + 1
    if ho is None:
        ho = hp - kp + 1
    assert ho >= 1 and wo >= 1
    bh = BH
    if ho % bh != 0 or bh < kp - 1:
        raise ValueError(
            f"head_conv_s2d_pallas needs ho % {bh} == 0 (got {ho}); "
            "use the XLA conv for this shape"
        )
    n_tiles = ho // bh
    assert hp >= (n_tiles + 1) * bh, (
        f"input rows {hp} < {(n_tiles + 1) * bh}: pad xp with "
        f"head_conv_extra_rows(ho) bottom rows"
    )

    bq = 2 if bh % 2 == 0 else bh  # sub-block rows per fold+dot (VMEM cap)
    return pl.pallas_call(
        _make_kernel(kp, bh, bq, wo, c),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, bh, wp_, c), lambda bi, j: (bi, j, 0, 0)),
            pl.BlockSpec((1, bh, wp_, c), lambda bi, j: (bi, j + 1, 0, 0)),
            pl.BlockSpec((kp, kp * c, n), lambda bi, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, wo, n), lambda bi, j: (bi, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, n), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + kp - 1, wp_, c), xp.dtype),
            pltpu.VMEM((bq, wo, kp * c), xp.dtype),
        ],
        interpret=interpret,
    )(xp, xp, w_folded)
