"""s2d-transformed trunk forwards for the fast inference path.

``_FastTrunk`` holds the transformed weights + staged forward for one
GlobalGenerator / Encoder trunk (reference networks.py:211-265 /
networks.py:386-416), ``_FastLocalG`` composes them into the LocalEnhancer
pyramid (networks.py:144-196). Split out of models/fast_codec.py (which
keeps the input assembly + variant selection in ``FastCodec``) — the weight
transforms themselves live in ops/s2d.py; bit-exactness vs the standard
modules is pinned by tests/test_fast_codec.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.config import FastPathConfig
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


