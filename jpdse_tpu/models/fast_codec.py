"""Optimized inference path: the trained codec re-expressed with
space-to-depth layers at the high-resolution ends.

Takes a trained ``SemanticCodec`` parameter PyTree and builds a functionally
identical deterministic decode (and code-extraction) pass where the
bandwidth/utilization-bound full-resolution layers — head 7x7 conv, first
stride-2 downsample, last ConvTranspose, tail 7x7 conv — run in the
space-to-depth domain (see ops/s2d.py for the exact weight transforms; all
are verified bit-near-exact in tests/test_fast_codec.py). Mid-trunk layers
(>=128 channels at <=1/4 resolution) already saturate the MXU and run
unchanged.

Supports the GlobalGenerator / Encoder family (netG 'global') and the
LocalEnhancer pyramid (netG 'local' — each enhancer's full-resolution
downsample/upsample stacks reuse the same s2d transforms, where they matter
most: those stacks run at 2x the global trunk's resolution). No grouped
convs, no instance-wise pooling; anything else falls back to the standard
module.

NOTE: pass **host** (numpy / CPU-backend) params. The constructor reads every
weight with np.asarray to run the transforms; device-resident params would
force a full device->host transfer first (prohibitive over the axon relay,
whose downloads run ~100KB/s).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.config import Config, FastPathConfig
from jpdse_tpu.models.codec import prepare_inputs
from jpdse_tpu.ops.semantics import instance_edges
from jpdse_tpu.models.layers import avg_pool_3s2, instance_norm, reflect_pad
from jpdse_tpu.ops.s2d import (
    conv_s1_weights_to_s2d,
    conv_s2_weights_from_s2d_nopad,
    conv_tap_split,
    conv_tap_split_w,
    conv_valid,
    convT_s2_weights_to_s2d,
    depth_to_space,
    fold_hw_taps,
    fold_w_taps,
    instance_norm_s2d,
    s2d_concat_interleave,
    s2d_realign_pad3,
    space_to_depth,
    weights_fold_hw,
    weights_fold_w,
    weights_tap_split,
    weights_tap_split_w,
)


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _tile4(bias: np.ndarray) -> np.ndarray:
    """Per-channel bias -> s2d channel layout ((sub, c) flattened)."""
    return np.tile(bias, 4)


class _FastTrunk:
    """Transformed weights + forward for one GlobalGenerator/Encoder trunk."""

    def __init__(self, params: Dict, n_down: int, n_blocks: int, binarize: str,
                 dtype, sharded: bool = False,
                 fp: Optional[FastPathConfig] = None):
        """binarize: 'none' | 'mid' (encoder: between down and up) |
        'before_res' | 'after_res' (generator bottleneck).

        ``fp``: resolved fast-path variant knobs (config.FastPathConfig —
        every field env-overridable; FastCodec passes its resolved copy).
        None builds a default-config copy with env overrides applied, for
        direct trunk construction in tools/benches.

        ``sharded``: the trunk will run on mesh-sharded inputs. pallas_call
        has no GSPMD partitioning rule, so the 'auto' grid re-alignment
        choice in :meth:`back` must avoid the Pallas kernel and use the jnp
        composition (whose d2s/pad/s2d ops GSPMD partitions with automatic
        halo exchanges).

        Sections are presence-driven so LocalEnhancer sub-stacks reuse the
        same transforms (models/fast_codec._FastLocalG): no ``head`` key ->
        no front (the trunk starts from a given feature map); no ``tail``
        key -> no s2d back stage, and every ``up{i}`` runs as a plain
        deconv (the LocalEnhancer global trunk drops its last 3 layers,
        networks.py:152-153)."""
        self.n_down = n_down
        self.n_blocks = n_blocks
        self.binarize = binarize
        self.dtype = dtype
        self.sharded = sharded
        self.fp = fp if fp is not None else FastPathConfig().resolved()
        p = params
        self.has_front = "head" in p
        self.has_back = "tail" in p

        def conv_wb(node):
            return _np(node["conv"]["kernel"]), _np(node["conv"]["bias"])

        # weights live in a flat dict PyTree passed through jit as an ARGUMENT
        # (closure-captured arrays get baked into the serialized compile
        # payload, which the remote-compile relay rejects for ~180MB graphs)
        w: Dict[str, Any] = {}
        if self.has_front:
            w7, b7 = conv_wb(p["head"]["conv"])
            wp_head = conv_s1_weights_to_s2d(w7)
            self.head_kp = wp_head.shape[0]
            c4 = wp_head.shape[2]  # s2d input channels (4x fine)
            # Tap-fold mode for the head conv (see ops/s2d.py fold_w_taps).
            # MEASURED REGRESSION (v5e, batch 8, 1024x512): netG front 27.0 ms
            # folded vs 20.7 unfolded; netE hw-fold 26.8 vs 14.1 std — XLA's conv
            # lowering already handles the per-tap K padding better than the
            # fold's extra relayout costs. Default OFF; fast.head_fold enables
            # (w-fold for c4 >= 128, full hw-fold below).
            # fast.head_pallas='1': do the w-tap fold in VMEM instead
            # (ops/pallas/head_conv.py) — the per-tap K (c4, padded to
            # 128-lane MXU tiles: ~62% useful on the flagship) becomes a
            # per-kernel-row K = 4*c4 contraction with no HBM relayout.
            # Only for heads that are actually K-starved: at tiny c4 the
            # conv is output-HBM-bound, not MXU-bound, and the kernel's
            # per-step overheads lose (netE c4=12: 10.6 ms Pallas vs 7.0
            # XLA at batch 8; head_pallas='force' overrides the gate).
            # No GSPMD rule -> sharded runs keep the XLA conv.
            _hp = self.fp.head_pallas
            if (
                _hp != "0"
                and not sharded
                and (c4 >= 64 or _hp == "force")
            ):
                self.head_fold = "pallas"
                w["head_w"] = jnp.asarray(
                    weights_fold_w(wp_head).reshape(
                        self.head_kp, self.head_kp * c4, -1
                    ),
                    dtype,
                )
            elif not self.fp.head_fold:
                self.head_fold = "none"
                w["head_w"] = jnp.asarray(wp_head, dtype)
            elif c4 >= 128:
                self.head_fold = "w"
                w["head_w"] = jnp.asarray(weights_fold_w(wp_head), dtype)
            else:
                self.head_fold = "hw"
                w["head_w"] = jnp.asarray(weights_fold_hw(wp_head), dtype)
            w["head_b"] = jnp.asarray(_tile4(b7), dtype)

            w_d0, b_d0 = conv_wb(p["down0"]["conv"])
            w["down0_w"] = jnp.asarray(conv_s2_weights_from_s2d_nopad(w_d0), dtype)
            w["down0_b"] = jnp.asarray(b_d0, dtype)
        else:
            self.head_fold = "none"

        for i in range(1, n_down):
            wi, bi = conv_wb(p[f"down{i}"]["conv"])
            w[f"down{i}_w"] = jnp.asarray(wi, dtype)
            w[f"down{i}_b"] = jnp.asarray(bi, dtype)
        self.n_mid_down = n_down - 1

        self.n_res = 0
        for i in range(n_blocks):
            blk = p.get(f"res{i}")
            if blk is None:
                break
            w1, b1 = conv_wb(blk["conv1"])
            w2, b2 = conv_wb(blk["conv2"])
            w[f"res{i}_w1"] = jnp.asarray(w1, dtype)
            w[f"res{i}_b1"] = jnp.asarray(b1, dtype)
            w[f"res{i}_w2"] = jnp.asarray(w2, dtype)
            w[f"res{i}_b2"] = jnp.asarray(b2, dtype)
            self.n_res += 1

        self.n_mid_up = n_down - 1 if self.has_back else n_down
        for i in range(self.n_mid_up):
            if f"up{i}" not in p:  # front-only sub-stack (LocalDownsample)
                self.n_mid_up = i
                break
            w[f"up{i}_w"] = jnp.asarray(_np(p[f"up{i}"]["deconv"]["kernel"]), dtype)
            w[f"up{i}_b"] = jnp.asarray(_np(p[f"up{i}"]["deconv"]["bias"]), dtype)

        if not self.has_back:
            if binarize != "none":
                w["bin_w"] = jnp.asarray(
                    _np(p["binarizer"]["conv"]["kernel"]), dtype)
            self.weights = w
            return

        # last upsample: transformed to produce s2d output
        wl = _np(p[f"up{n_down - 1}"]["deconv"]["kernel"])
        bl = _np(p[f"up{n_down - 1}"]["deconv"]["bias"])
        g = np.flip(wl, axis=(0, 1))  # effective correlation kernel
        w["uplast_w"] = jnp.asarray(convT_s2_weights_to_s2d(g), dtype)
        w["uplast_b"] = jnp.asarray(_tile4(bl), dtype)

        wt = _np(p["tail"]["conv"]["kernel"])
        bt = _np(p["tail"]["conv"]["bias"])
        wt_p = conv_s1_weights_to_s2d(wt)
        self.tail_kp = wt_p.shape[0]
        # Tap-split the tail conv when its s2d output width is MXU-starved
        # (12 of 128 lanes for RGB tails — ~10.5 TFLOP/s measured): the
        # 1x1-conv + shift-add form (ops/s2d.py conv_tap_split) keeps the
        # matmul N at kh*kw*Cout (192). JPDSE_TAIL_SPLIT=0 restores the
        # direct conv.
        ntaps = self.tail_kp * self.tail_kp
        cout4 = wt_p.shape[-1]

        def _pad128_eff(n):
            return n / (-(-n // 128) * 128)

        self.tail_split = "none"
        # fast.tail_wgroup: width taps kept inside the kernel per split
        # group (1 = per-tap split, N = kw*Cout; 2 = pairs, N = kw/2*Cout
        # with half the intermediate-z HBM traffic). Default 2: measured
        # 11.75 vs 12.50 ms for the netE4label tail at batch 8 full res
        # (75% lane fill but half the z traffic beats 90% fill).
        self.tail_wgroup = self.fp.tail_wgroup
        if self.fp.tail_split:
            if ntaps * cout4 <= 256:
                self.tail_split = "full"  # e.g. RGB tails: N 12 -> 192
            elif _pad128_eff(self.tail_kp * cout4) > _pad128_eff(cout4) + 0.1:
                # e.g. netE4label: N 144 (56% of padded lanes) -> 576 (90%)
                self.tail_split = "w"
        if self.tail_split == "full":
            w["tail_w"] = jnp.asarray(weights_tap_split(wt_p), dtype)
        elif self.tail_split == "w":
            w["tail_w"] = jnp.asarray(
                weights_tap_split_w(wt_p, self.tail_wgroup), dtype
            )
        else:
            w["tail_w"] = jnp.asarray(wt_p, dtype)
        w["tail_b"] = jnp.asarray(_tile4(bt), dtype)

        if binarize != "none":
            w["bin_w"] = jnp.asarray(_np(p["binarizer"]["conv"]["kernel"]), dtype)
        self.weights = w

    # -- stages (weights passed explicitly; see __init__ note) -----------
    def front(self, w: Dict, x: jax.Array) -> jax.Array:
        """fine input -> normal-domain tensor after down0 (H/2, W/2, C1)."""
        x = x.astype(self.dtype)
        if self.head_fold == "pallas":
            h = self._front_head_pallas(w, x)
            h = jax.nn.relu(instance_norm_s2d(h, use_shift=self.fp.norm_shift))
            h = jnp.pad(h, ((0, 0), (1, 0), (1, 0), (0, 0)))
            h = conv_valid(h, w["down0_w"]) + w["down0_b"]
            return jax.nn.relu(instance_norm(h))
        # One-pass entry into the s2d domain (ops/pallas/realign.py
        # s2d_pad3_pallas, the front-side sibling of the back-stage grid
        # re-alignment): pad3 + s2d in a single read+write instead of XLA's
        # pad copy + relayout. MEASURED ON-CHIP: netG fast front 48.1 vs
        # 20.7 ms at batch 8 — a 2.3x REGRESSION, default off (PERF.md
        # negative ledger): unlike the back stage's three passes, the
        # front's reflect-pad is fused by XLA into the following conv's
        # input pipeline, and the Pallas call breaks that producer fusion.
        # fast.front_realign='pallas' re-enables for re-measurement
        # (tools/bench_fast_stages.py --fronts-only). Same mesh caveat
        # as the back kernel: pallas_call has no GSPMD partitioning rule,
        # so sharded runs keep the jnp composition.
        how = self.fp.front_realign
        if how in ("auto", "pallas") and not self.sharded:
            from jpdse_tpu.ops.pallas.realign import pallas_realign_supported

            how = "pallas" if pallas_realign_supported() else "0"
        else:
            how = "0"
        if how == "pallas":
            from jpdse_tpu.ops.pallas.realign import s2d_pad3_pallas

            xp = s2d_pad3_pallas(x)
        else:
            xp = space_to_depth(reflect_pad(x, 3))
        if self.head_fold == "w":
            xp = fold_w_taps(xp, self.head_kp)
        elif self.head_fold == "hw":
            xp = fold_hw_taps(xp, self.head_kp, self.head_kp)
        h = conv_valid(xp, w["head_w"]) + w["head_b"]
        h = jax.nn.relu(instance_norm_s2d(h, use_shift=self.fp.norm_shift))
        h = jnp.pad(h, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = conv_valid(h, w["down0_w"]) + w["down0_b"]
        return jax.nn.relu(instance_norm(h))

    def _front_head_pallas(self, w: Dict, x: jax.Array) -> jax.Array:
        """Head conv via the VMEM-im2col kernel (ops/pallas/head_conv.py):
        the reflect pad carries head_conv_extra_rows of extra bottom rows
        (reflected values, never read into an output) so the kernel's
        second row view stays in bounds; falls back to the plain conv
        off-TPU or for row counts the kernel doesn't tile (ho % 4 != 0) —
        the w-folded weights unfold by pure reshape."""
        from jpdse_tpu.ops.pallas.head_conv import (
            BH,
            head_conv_extra_rows,
            head_conv_s2d_pallas,
            pallas_head_conv_supported,
        )

        kp = self.head_kp
        ho = x.shape[1] // 2
        if pallas_head_conv_supported() and ho % BH == 0:
            extra = head_conv_extra_rows(ho, kp)
            # Produce the padded s2d input as one XLA transpose copy (plain
            # space_to_depth, no pad) + the BACK-stage realign kernel (pad3
            # of an s2d tensor = tap permutation + shifted block moves — the
            # movement pattern Pallas is fast at). The alternatives both
            # measured worse at batch 8 (tools/profile_front.py,
            # /tmp/head_pallas_v*__ logs): the jnp pad+s2d producer
            # materializes ~10 ms of pad/transpose/operand copies around the
            # kernel (23.9 ms front), and the fine-input s2d_pad3_pallas
            # producer pays ~17 us/row for the W-interleave shuffles
            # (49.8 ms front).
            from jpdse_tpu.ops.pallas.realign import s2d_realign_pad3_pallas

            xp = s2d_realign_pad3_pallas(space_to_depth(x), extra_rows=extra)
            return head_conv_s2d_pallas(xp, w["head_w"], kp, ho=ho) + w["head_b"]
        xp = space_to_depth(reflect_pad(x, 3))
        c4 = xp.shape[-1]
        wk = w["head_w"].reshape(kp, kp, c4, -1)
        return conv_valid(xp, wk) + w["head_b"]

    def mid_down(self, w: Dict, h: jax.Array) -> jax.Array:
        for i in range(1, self.n_mid_down + 1):
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            h = conv_valid(hp, w[f"down{i}_w"], stride=2) + w[f"down{i}_b"]
            h = jax.nn.relu(instance_norm(h))
        return h

    def apply_binarizer(self, w: Dict, h: jax.Array) -> jax.Array:
        h = conv_valid(h, w["bin_w"])
        return jnp.sign(jnp.tanh(h)).astype(self.dtype)

    def res_blocks(self, w: Dict, h: jax.Array) -> jax.Array:
        for i in range(self.n_res):
            r = conv_valid(reflect_pad(h, 1), w[f"res{i}_w1"]) + w[f"res{i}_b1"]
            r = jax.nn.relu(instance_norm(r))
            r = conv_valid(reflect_pad(r, 1), w[f"res{i}_w2"]) + w[f"res{i}_b2"]
            h = h + instance_norm(r)
        return h

    def mid_up(self, w: Dict, h: jax.Array) -> jax.Array:
        for i in range(self.n_mid_up):
            wk, bk = w[f"up{i}_w"], w[f"up{i}_b"]
            dn = jax.lax.conv_dimension_numbers(
                h.shape, wk.shape, ("NHWC", "HWIO", "NHWC")
            )
            h = jax.lax.conv_general_dilated(
                h, jnp.flip(wk, axis=(0, 1)), (1, 1), ((1, 2), (1, 2)),
                lhs_dilation=(2, 2), dimension_numbers=dn,
            ) + bk
            h = jax.nn.relu(instance_norm(h))
        return h

    def _realign(self, y: jax.Array) -> jax.Array:
        """Grid re-alignment: ``s2d(reflect_pad(d2s(y), 3))`` in one pass.
        Measured at batch 8 full res on v5e (tools/bench_e4l_back.py): the
        d2s->pad->s2d composition costs 8.05 ms (two full-tensor HBM round
        trips); the XLA slice-concat re-expression (s2d_realign_pad3,
        JPDSE_FUSED_REALIGN=xla) is WORSE at 15.2 ms (C-sized channel-block
        slices break 128-lane alignment); the Pallas one-pass kernel
        (ops/pallas/realign.py) does it in 5.03 ms and the netE4label back
        stage drops 27.4 -> 17.5 ms — so Pallas is the TPU default
        (bit-exact; JPDSE_FUSED_REALIGN=0 restores the composition, =xla
        the slice-concat form). Used before every trunk's 7x7 tail and, in
        s2d-e2e mode, before the head conv of a trunk whose input arrives
        already in the s2d domain (front_s2d)."""
        how = self.fp.fused_realign
        if how == "auto":
            if self.sharded:
                # pallas_call has no GSPMD partitioning rule — under a mesh
                # the jnp composition lets XLA shard d2s/pad/s2d with
                # automatic halo exchanges instead of gathering the full
                # tensor per chip (forcing =pallas under a mesh is unsupported)
                how = "0"
            else:
                from jpdse_tpu.ops.pallas.realign import pallas_realign_supported

                how = "pallas" if pallas_realign_supported() else "0"
        if how == "pallas":
            from jpdse_tpu.ops.pallas.realign import s2d_realign_pad3_pallas

            return s2d_realign_pad3_pallas(y)
        if how in ("1", "xla"):
            return s2d_realign_pad3(y)
        return space_to_depth(reflect_pad(depth_to_space(y), 3))

    def front_s2d(self, w: Dict, x: jax.Array) -> jax.Array:
        """:meth:`front` for an input already in the s2d domain (the global
        (sub, c) channel layout — s2d_concat_interleave). Skips the
        full-resolution pad+relayout entirely: the pad-3 re-alignment runs
        as the one-pass kernel and the head conv consumes the identical
        tensor front() would have built — bit-exact by construction
        (PERF.md: the front stages' ~7 ms/trunk of producer relayout copies
        were the measured remaining headroom)."""
        if self.head_fold == "pallas":
            # the VMEM head kernel path manages its own producer; fall back
            # through the fine domain (measured-negative path kept runnable)
            return self.front(w, depth_to_space(x))
        x = x.astype(self.dtype)
        xp = self._realign(x)
        if self.head_fold == "w":
            xp = fold_w_taps(xp, self.head_kp)
        elif self.head_fold == "hw":
            xp = fold_hw_taps(xp, self.head_kp, self.head_kp)
        h = conv_valid(xp, w["head_w"]) + w["head_b"]
        h = jax.nn.relu(instance_norm_s2d(h, use_shift=self.fp.norm_shift))
        h = jnp.pad(h, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = conv_valid(h, w["down0_w"]) + w["down0_b"]
        return jax.nn.relu(instance_norm(h))

    def back(self, w: Dict, h: jax.Array, keep_s2d: bool = False) -> jax.Array:
        """normal-domain (H/2, W/2, Clast) -> fine output with tanh.
        ``keep_s2d``: return the tail output in the s2d domain (skip the
        final depth_to_space) — for trunks whose output feeds another s2d
        front (s2d-e2e mode)."""
        hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = conv_valid(hp, w["uplast_w"]) + w["uplast_b"]
        y = jax.nn.relu(instance_norm_s2d(y, use_shift=self.fp.norm_shift))
        yp = self._realign(y)
        if self.tail_split == "full":
            t = conv_tap_split(yp, w["tail_w"], self.tail_kp, self.tail_kp)
        elif self.tail_split == "w":
            t = conv_tap_split_w(yp, w["tail_w"], self.tail_kp, self.tail_wgroup)
        else:
            t = conv_valid(yp, w["tail_w"])
        out = jnp.tanh(t + w["tail_b"])
        return out if keep_s2d else depth_to_space(out)

    # -- full passes ----------------------------------------------------
    def __call__(self, w: Dict, x: jax.Array, x_is_s2d: bool = False,
                 keep_s2d: bool = False) -> jax.Array:
        if self.has_front:
            h = self.front_s2d(w, x) if x_is_s2d else self.front(w, x)
        else:
            h = x.astype(self.dtype)
        h = self.mid_down(w, h)
        if self.binarize in ("before_res", "mid"):
            h = self.apply_binarizer(w, h)
        h = self.res_blocks(w, h)
        if self.binarize == "after_res":
            h = self.apply_binarizer(w, h)
        h = self.mid_up(w, h)
        return self.back(w, h, keep_s2d=keep_s2d) if self.has_back else h

    def decode_from_code(self, w: Dict, code_pm1: jax.Array,
                         keep_s2d: bool = False) -> jax.Array:
        """Resume the trunk after the binarizer ({-1,+1} input) — the
        deploy-time decoder side (generator.py decode_from_code)."""
        if self.binarize == "none":
            raise ValueError("no binarizer in this trunk")
        h = code_pm1.astype(self.dtype)
        if self.binarize == "before_res":
            h = self.res_blocks(w, h)
        return self.back(w, self.mid_up(w, h), keep_s2d=keep_s2d)

    def encode(self, w: Dict, x: jax.Array, x_is_s2d: bool = False) -> jax.Array:
        if self.binarize == "none":
            raise ValueError("no binarizer in this trunk")
        h = self.front_s2d(w, x) if x_is_s2d else self.front(w, x)
        h = self.mid_down(w, h)
        if self.binarize in ("before_res", "mid"):
            return self.apply_binarizer(w, h)
        h = self.res_blocks(w, h)
        return self.apply_binarizer(w, h)


class _FastLocalG:
    """s2d-optimized LocalEnhancer generator (generator.py:181-262;
    reference networks.py:144-196).

    The coarse global trunk (minus its tail, networks.py:152-153) is a
    presence-driven _FastTrunk; each enhancer's full-resolution
    7x7+stride-2 downsample stack has exactly the head/front geometry and
    its res-blocks + ConvTranspose + 7x7-tail upsample stack exactly the
    back geometry, so both reuse the _FastTrunk s2d transforms — including
    the tail tap-split and the Pallas grid re-alignment, which matter MOST
    here (the enhancer's head/tail run at 2x the global config's
    resolution)."""

    def __init__(self, params: Dict, m, dtype, sharded: bool = False,
                 fp: Optional[FastPathConfig] = None):
        self.dtype = dtype
        self.n_local = m.n_local_enhancers
        self.glob = _FastTrunk(
            params["global"], m.n_downsample_global, m.n_blocks_global,
            "none", dtype, sharded=sharded, fp=fp,
        )
        self.downs: List[_FastTrunk] = []
        self.ups: List[_FastTrunk] = []
        w: Dict[str, Any] = {"global": self.glob.weights}
        for n in range(1, self.n_local + 1):
            pd = params[f"local{n}_down"]
            down = _FastTrunk({"head": pd["c7"], "down0": pd["d1"]},
                              1, 0, "none", dtype, sharded=sharded, fp=fp)
            pu = params[f"local{n}_up"]
            up_p = {k: v for k, v in pu.items() if k.startswith("res")}
            up_p["up0"] = pu["up"]
            if "tail" in pu:  # only the final enhancer has one
                up_p["tail"] = pu["tail"]
            up = _FastTrunk(up_p, 1, m.n_blocks_local, "none", dtype,
                            sharded=sharded, fp=fp)
            self.downs.append(down)
            self.ups.append(up)
            w[f"down{n}"] = down.weights
            w[f"up{n}"] = up.weights
        self.weights = w

    def __call__(self, w: Dict, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        pyramid = [x]
        for _ in range(self.n_local):
            pyramid.append(avg_pool_3s2(pyramid[-1]))
        h = self.glob(w["global"], pyramid[-1])
        for n in range(self.n_local):
            inp = pyramid[self.n_local - 1 - n]
            d = self.downs[n].front(w[f"down{n + 1}"], inp)
            h = self.ups[n](w[f"up{n + 1}"], d + h)
        return h


class FastCodec:
    """Optimized deterministic inference over trained SemanticCodec params.

    Usage (weights are an explicit PyTree so jit serializes no constants):
        fast = FastCodec(cfg, host_params)
        out = jax.jit(fast.decode_fn)(fast.weights, batch)
    ``decode(batch)`` is the convenience form (jits internally).
    """

    def __init__(self, cfg: Config, params_g: Dict, dtype=None,
                 sharded: bool = False):
        m = cfg.model
        # decode_from_codes_fn indexes codes[0] as the netE4label code, which
        # is only safe under the validated invariant that encoders and
        # generator are never binarized together (Config.validate)
        cfg.validate()
        if (
            m.netG not in ("global", "local") or m.netE_groups != 1
            or m.inst_wise_pool or m.sem_masking or m.norm != "instance"
        ):
            raise ValueError(
                "FastCodec supports the global/local ungrouped instance-norm "
                "configurations; other configs use SemanticCodec"
            )
        self.cfg = cfg
        # fast-path variant knobs: config fields with env overrides applied
        # (config.FastPathConfig.resolved — resolution happens HERE, once;
        # no trace-time env reads). Domain-checked; invalid combos from env
        # sweeps defer below with a warning rather than raising.
        fp = m.fast.resolved()
        fp.validate(check_combos=False)
        self.fp = fp
        dtype = dtype or (
            jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
        )
        g_bin = "none"
        if not m.no_generator_binarization:
            g_bin = "before_res" if m.bin_generator_before_res else "after_res"
        if m.netG == "local":
            # local enhancers never binarize (codec.py raises), so the
            # encode/decode_from_code trunk surface is not needed here
            self.netG = _FastLocalG(params_g["netG"], m, dtype,
                                    sharded=sharded, fp=fp)
        else:
            self.netG = _FastTrunk(
                params_g["netG"], m.n_downsample_global, m.n_blocks_global,
                g_bin, dtype, sharded=sharded, fp=fp,
            )
        self.netE = None
        if cfg.use_netE:
            self.netE = _FastTrunk(
                params_g["netE"], m.n_downsample_E, 0,
                "mid" if not m.no_encoder_binarization else "none", dtype,
                sharded=sharded, fp=fp,
            )
        self.netE4label = None
        if cfg.use_netE4label:
            self.netE4label = _FastTrunk(
                params_g["netE4label"], m.n_downsample_E4label, 0,
                "mid" if not m.no_label_encoder_binarization else "none", dtype,
                sharded=sharded, fp=fp,
            )
        self.weights = {"netG": self.netG.weights}
        if self.netE is not None:
            self.weights["netE"] = self.netE.weights
        if self.netE4label is not None:
            self.weights["netE4label"] = self.netE4label.weights
        # s2d end-to-end mode (fast.s2d_e2e / JPDSE_S2D_E2E): assemble the trunk inputs
        # directly in the s2d domain (one-hot of the s2d'd label map, s2d'd
        # edge/visual channels, upstream tails kept pre-depth_to_space) and
        # enter each front through the one-pass pad-3 re-alignment
        # (_FastTrunk.front_s2d) — eliminating every full-resolution
        # pad+relayout producer copy between stages. MEASURED NEGATIVE
        # (PERF.md round-3c): 36.32 vs 38.33 MP/s/chip at the bench
        # default — the s2d-domain assembly's own movement (interleave
        # stitch, 140-channel one-hot) costs more than the relayouts it
        # removes, so the mode stays env-opt-in. Bit-exact: the head
        # convs consume the identical tensors (s2d_concat_interleave
        # restores the global (sub, c) layout, so the trunk weights are
        # unchanged and both front paths stay valid). Global trunks only
        # (the LocalEnhancer pyramid needs the fine input for its
        # avg-pool levels); the sharded path keeps the fine assembly whose
        # d2s/pad/s2d ops GSPMD partitions with automatic halo exchanges.
        self.s2d_e2e = fp.s2d_e2e and m.netG == "global" and not sharded
        if self.s2d_e2e and any(
            t.head_fold == "pallas"
            for t in (self.netG, self.netE, self.netE4label)
            if t is not None
        ):
            # the VMEM head kernel's front_s2d fallback would round-trip
            # every trunk input through depth_to_space and back — combining
            # the modes inverts the e2e saving into a net regression, so
            # the e2e assembly defers to the kernel request. Gated on the
            # EFFECTIVE per-trunk decision (head_fold == 'pallas'), not the
            # raw head_pallas knob: with head_pallas='1' and every head
            # below the c4>=64 bar, the trunks keep the XLA conv and
            # s2d_e2e stays usable. (The config-level force pair is
            # rejected earlier, in Config.validate.)
            print(
                "[fast_codec] s2d_e2e (JPDSE_S2D_E2E) disabled: the pallas "
                "head kernel manages its own (fine-domain) producer — "
                "combining them would add d2s/s2d round trips"
            )
            self.s2d_e2e = False
        self._jit_decode = None
        self._jit_codes_shaped = None
        self._jit_decode_codes = None

    def _inputs(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        # cast visuals to the compute dtype BEFORE preprocessing: the one-hot
        # scatter and the 40-channel concat then run in bf16 (the 0/1 one-hot
        # and edge values are exact in bf16, and the image cast happens in
        # front() anyway — bit-identical output, ~half the HBM traffic on the
        # full-resolution input assembly)
        dt = self.netG.dtype
        comp = batch.get("compressed")
        return prepare_inputs(
            self.cfg, batch.get("label"), batch.get("instance"),
            batch["image"].astype(dt),
            comp.astype(dt) if comp is not None else None,
        )

    def _vis(self, inputs):
        if self.cfg.codec.use_compressed:
            return inputs["compressed_img"]
        return inputs["real_image"]

    def _concat(self, weights: Dict, inputs) -> jax.Array:
        """The generator's input (label features ++ visual features)."""
        m = self.cfg.model
        input_label = inputs["input_label"]
        if self.netE4label is not None:
            input_label = self.netE4label(weights["netE4label"], input_label)
        feat = None
        if not m.no_feat:
            vis = self._vis(inputs)
            feat = self.netE(weights["netE"], vis) if self.netE is not None else vis
        if feat is None:
            return input_label
        if input_label is None:
            return feat
        return jnp.concatenate([input_label, feat.astype(input_label.dtype)], axis=-1)

    # -- s2d-e2e input assembly (see the __init__ note) -------------------
    def _label_comps_s2d(self, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        """The semantic input (one-hot label ++ edge map) as per-component
        s2d tensors, built IN the s2d domain. Bit-exact vs
        ``space_to_depth(prepare_semantics(...))`` after interleaving:
        one-hot is elementwise so it commutes with the s2d permutation, and
        the edge map is a 1-channel relayout."""
        m, dt = self.cfg.model, self.netG.dtype
        comps = []
        if not m.no_label:
            lab = batch["label"]
            if lab.ndim == 3:
                lab = lab[..., None]
            lab4 = space_to_depth(lab.astype(jnp.int32))
            nc = self.cfg.data.semantic_nc
            oh = jax.nn.one_hot(jnp.clip(lab4, 0, nc - 1), nc, dtype=dt)
            comps.append(oh.reshape(oh.shape[0], oh.shape[1], oh.shape[2], 4 * nc))
        if not m.no_instance:
            comps.append(
                space_to_depth(instance_edges(batch["instance"], dtype=dt))
            )
        return comps

    def _vis_s2d(self, batch: Dict[str, jax.Array]) -> jax.Array:
        vis = (
            batch["compressed"]
            if self.cfg.codec.use_compressed
            else batch["image"]
        )
        return space_to_depth(vis.astype(self.netG.dtype))

    def _g_input_s2d(
        self, weights: Dict, batch: Dict[str, jax.Array]
    ) -> List[jax.Array]:
        """netG's input (label features ++ visual features) as per-component
        s2d tensors — upstream trunks entered via front_s2d and exited
        pre-depth_to_space (the s2d-e2e form of :meth:`_concat`)."""
        m = self.cfg.model
        comps = self._label_comps_s2d(batch)
        if comps and self.netE4label is not None:
            x = s2d_concat_interleave(comps)
            comps = [
                self.netE4label(
                    weights["netE4label"], x, x_is_s2d=True, keep_s2d=True
                )
            ]
        if not m.no_feat:
            v = self._vis_s2d(batch)
            if self.netE is not None:
                v = self.netE(weights["netE"], v, x_is_s2d=True, keep_s2d=True)
            comps.append(v)
        return comps

    def decode_fn(self, weights: Dict, batch: Dict[str, jax.Array]) -> jax.Array:
        """Pure function of (weights, batch) — jit this."""
        if self.s2d_e2e:
            comps = self._g_input_s2d(weights, batch)
            return self.netG(
                weights["netG"], s2d_concat_interleave(comps), x_is_s2d=True
            )
        inputs = self._inputs(batch)
        return self.netG(weights["netG"], self._concat(weights, inputs))

    def decode(self, batch: Dict[str, jax.Array]) -> jax.Array:
        if self._jit_decode is None:
            self._jit_decode = jax.jit(self.decode_fn)
        return self._jit_decode(self.weights, batch)

    def codes_shaped_fn(self, weights: Dict, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        """Binary codes in native (B, h, w, C) {0,1} layout, in the same order
        as SemanticCodec.get_codes_shaped (netE4label, netE, G-bottleneck)."""
        m = self.cfg.model
        codes = []

        def to01(c):
            return (c + 1.0) / 2.0

        if self.s2d_e2e:
            if self.netE4label is not None and not m.no_label_encoder_binarization:
                x = s2d_concat_interleave(self._label_comps_s2d(batch))
                codes.append(
                    to01(self.netE4label.encode(
                        weights["netE4label"], x, x_is_s2d=True))
                )
            if self.netE is not None and not m.no_encoder_binarization:
                codes.append(to01(self.netE.encode(
                    weights["netE"], self._vis_s2d(batch), x_is_s2d=True)))
            if not m.no_generator_binarization:
                concat = s2d_concat_interleave(self._g_input_s2d(weights, batch))
                codes.append(to01(self.netG.encode(
                    weights["netG"], concat, x_is_s2d=True)))
            return codes

        inputs = self._inputs(batch)
        if self.netE4label is not None and not m.no_label_encoder_binarization:
            codes.append(
                to01(self.netE4label.encode(weights["netE4label"], inputs["input_label"]))
            )
        if self.netE is not None and not m.no_encoder_binarization:
            codes.append(to01(self.netE.encode(weights["netE"], self._vis(inputs))))
        if not m.no_generator_binarization:
            concat = self._concat(weights, inputs)
            codes.append(to01(self.netG.encode(weights["netG"], concat)))
        return codes

    def get_codes(self, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        return [
            c.reshape(c.shape[0], -1) for c in self.get_codes_shaped(batch)
        ]

    def get_codes_shaped(self, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        if self._jit_codes_shaped is None:
            self._jit_codes_shaped = jax.jit(self.codes_shaped_fn)
        return self._jit_codes_shaped(self.weights, batch)

    def decode_from_codes_fn(
        self,
        weights: Dict,
        codes: List[jax.Array],
        side_batch: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """Deploy-time decoder from the bitstream content alone ((B, h, w, C)
        {0,1} codes in get_codes_shaped order, plus the .jpds side-info
        sections as a loader-shaped batch for raw branches) — mirrors
        SemanticCodec.decode_from_codes with the s2d-optimized trunks."""
        m = self.cfg.model
        if not m.no_generator_binarization:
            return self.netG.decode_from_code(
                weights["netG"], codes[0] * 2.0 - 1.0
            )
        if self.s2d_e2e:
            return self._decode_from_codes_s2d(weights, codes, side_batch)
        side_inputs = None
        if side_batch is not None:
            if side_batch.get("label") is None:
                # shared no-label assembly (train/step.py raw_side_inputs):
                # one definition for both .jpds decoders. (Instance ids
                # without a label can't reach FastCodec — that needs
                # inst_wise_pool, rejected in __init__ — the shared helper
                # passes them through regardless.)
                from jpdse_tpu.train.step import raw_side_inputs

                side_inputs = raw_side_inputs(side_batch, dtype=self.netG.dtype)
            else:
                side_inputs = self._inputs(side_batch)

        def need_side(what):
            if side_inputs is None:
                raise ValueError(
                    f"decode_from_codes: {what} must ride as .jpds side info "
                    "for this configuration"
                )

        i = 0
        input_label = None
        if self.netE4label is not None and not m.no_label_encoder_binarization:
            input_label = self.netE4label.decode_from_code(
                weights["netE4label"], codes[i] * 2.0 - 1.0
            )
            i += 1
        elif not m.no_label:
            need_side("raw semantics")
            input_label = side_inputs["input_label"]
            if self.netE4label is not None:
                input_label = self.netE4label(weights["netE4label"], input_label)
        feat = None
        if not m.no_feat:
            if self.netE is not None and not m.no_encoder_binarization:
                feat = self.netE.decode_from_code(
                    weights["netE"], codes[i] * 2.0 - 1.0
                )
                i += 1  # keep the index math in lockstep with codec.py
            else:
                need_side("visual features (base-codec payload)")
                feat = self._vis(side_inputs)
                if self.netE is not None:
                    feat = self.netE(weights["netE"], feat)
        if feat is None:
            concat = input_label
        elif input_label is None:
            concat = feat
        else:
            concat = jnp.concatenate(
                [input_label, feat.astype(input_label.dtype)], axis=-1
            )
        return self.netG(weights["netG"], concat)

    def _decode_from_codes_s2d(
        self,
        weights: Dict,
        codes: List[jax.Array],
        side_batch: Optional[Dict[str, jax.Array]],
    ) -> jax.Array:
        """s2d-e2e deploy decoder (generator-unbinarized configs): code-fed
        trunks exit pre-depth_to_space, raw side info assembles directly in
        the s2d domain, and netG enters via front_s2d — the same boundary
        elimination as decode_fn, from the bitstream content alone."""
        m = self.cfg.model

        def need_side(what):
            if side_batch is None:
                raise ValueError(
                    f"decode_from_codes: {what} must ride as .jpds side info "
                    "for this configuration"
                )

        i = 0
        comps: List[jax.Array] = []
        if self.netE4label is not None and not m.no_label_encoder_binarization:
            comps.append(
                self.netE4label.decode_from_code(
                    weights["netE4label"], codes[i] * 2.0 - 1.0, keep_s2d=True
                )
            )
            i += 1
        elif not m.no_label:
            need_side("raw semantics")
            label_comps = self._label_comps_s2d(side_batch)
            if self.netE4label is not None:
                comps.append(
                    self.netE4label(
                        weights["netE4label"],
                        s2d_concat_interleave(label_comps),
                        x_is_s2d=True,
                        keep_s2d=True,
                    )
                )
            else:
                comps.extend(label_comps)
        if not m.no_feat:
            if self.netE is not None and not m.no_encoder_binarization:
                comps.append(
                    self.netE.decode_from_code(
                        weights["netE"], codes[i] * 2.0 - 1.0, keep_s2d=True
                    )
                )
                i += 1  # keep the index math in lockstep with codec.py
            else:
                need_side("visual features (base-codec payload)")
                v = self._vis_s2d(side_batch)
                if self.netE is not None:
                    v = self.netE(weights["netE"], v, x_is_s2d=True, keep_s2d=True)
                comps.append(v)
        return self.netG(
            weights["netG"], s2d_concat_interleave(comps), x_is_s2d=True
        )

    def decode_from_codes(
        self, codes: List[jax.Array], side_batch: Optional[Dict] = None
    ) -> jax.Array:
        if self._jit_decode_codes is None:
            self._jit_decode_codes = jax.jit(self.decode_from_codes_fn)
        return self._jit_decode_codes(self.weights, codes, side_batch)
