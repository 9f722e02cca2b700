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

Supports the GlobalGenerator / Encoder family (netG 'global', no grouped
convs, no instance-wise pooling). Anything else falls back to the standard
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

from jpdse_tpu.config import Config
from jpdse_tpu.models.codec import prepare_inputs
from jpdse_tpu.models.layers import instance_norm, reflect_pad
from jpdse_tpu.ops.s2d import (
    conv_s1_weights_to_s2d,
    conv_s2_weights_from_s2d_nopad,
    conv_valid,
    convT_s2_weights_to_s2d,
    depth_to_space,
    instance_norm_s2d,
    space_to_depth,
)


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _tile4(bias: np.ndarray) -> np.ndarray:
    """Per-channel bias -> s2d channel layout ((sub, c) flattened)."""
    return np.tile(bias, 4)


class _FastTrunk:
    """Transformed weights + forward for one GlobalGenerator/Encoder trunk."""

    def __init__(self, params: Dict, n_down: int, n_blocks: int, binarize: str, dtype):
        """binarize: 'none' | 'mid' (encoder: between down and up) |
        'before_res' | 'after_res' (generator bottleneck)."""
        self.n_down = n_down
        self.n_blocks = n_blocks
        self.binarize = binarize
        self.dtype = dtype
        p = params

        def conv_wb(node):
            return _np(node["conv"]["kernel"]), _np(node["conv"]["bias"])

        w7, b7 = conv_wb(p["head"]["conv"])
        self.head_w = jnp.asarray(conv_s1_weights_to_s2d(w7), dtype)
        self.head_b = jnp.asarray(_tile4(b7), dtype)

        w_d0, b_d0 = conv_wb(p["down0"]["conv"])
        self.down0_w = jnp.asarray(conv_s2_weights_from_s2d_nopad(w_d0), dtype)
        self.down0_b = jnp.asarray(b_d0, dtype)

        self.down = []
        for i in range(1, n_down):
            w, b = conv_wb(p[f"down{i}"]["conv"])
            self.down.append((jnp.asarray(w, dtype), jnp.asarray(b, dtype)))

        self.res = []
        for i in range(n_blocks):
            blk = p.get(f"res{i}")
            if blk is None:
                break
            w1, b1 = conv_wb(blk["conv1"])
            w2, b2 = conv_wb(blk["conv2"])
            self.res.append(
                (jnp.asarray(w1, dtype), jnp.asarray(b1, dtype),
                 jnp.asarray(w2, dtype), jnp.asarray(b2, dtype))
            )

        self.up = []
        for i in range(n_down - 1):
            w = _np(p[f"up{i}"]["deconv"]["kernel"])
            b = _np(p[f"up{i}"]["deconv"]["bias"])
            self.up.append((jnp.asarray(w, dtype), jnp.asarray(b, dtype)))

        # last upsample: transformed to produce s2d output
        wl = _np(p[f"up{n_down - 1}"]["deconv"]["kernel"])
        bl = _np(p[f"up{n_down - 1}"]["deconv"]["bias"])
        g = np.flip(wl, axis=(0, 1))  # effective correlation kernel
        self.uplast_w = jnp.asarray(convT_s2_weights_to_s2d(g), dtype)
        self.uplast_b = jnp.asarray(_tile4(bl), dtype)

        wt = _np(p["tail"]["conv"]["kernel"])
        bt = _np(p["tail"]["conv"]["bias"])
        self.tail_w = jnp.asarray(conv_s1_weights_to_s2d(wt), dtype)
        self.tail_b = jnp.asarray(_tile4(bt), dtype)

        if binarize != "none":
            self.bin_w = jnp.asarray(_np(p["binarizer"]["conv"]["kernel"]), dtype)
        else:
            self.bin_w = None

    # -- stages ---------------------------------------------------------
    def front(self, x: jax.Array) -> jax.Array:
        """fine input -> normal-domain tensor after down0 (H/2, W/2, C1)."""
        x = x.astype(self.dtype)
        xp = space_to_depth(reflect_pad(x, 3))
        h = conv_valid(xp, self.head_w) + self.head_b
        h = jax.nn.relu(instance_norm_s2d(h))
        h = jnp.pad(h, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = conv_valid(h, self.down0_w) + self.down0_b
        return jax.nn.relu(instance_norm(h))

    def mid_down(self, h: jax.Array) -> jax.Array:
        for w, b in self.down:
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            h = conv_valid(hp, w, stride=2) + b
            h = jax.nn.relu(instance_norm(h))
        return h

    def apply_binarizer(self, h: jax.Array) -> jax.Array:
        h = conv_valid(h, self.bin_w)
        return jnp.sign(jnp.tanh(h)).astype(self.dtype)

    def res_blocks(self, h: jax.Array) -> jax.Array:
        for w1, b1, w2, b2 in self.res:
            r = conv_valid(reflect_pad(h, 1), w1) + b1
            r = jax.nn.relu(instance_norm(r))
            r = conv_valid(reflect_pad(r, 1), w2) + b2
            h = h + instance_norm(r)
        return h

    def mid_up(self, h: jax.Array) -> jax.Array:
        for w, b in self.up:
            dn = jax.lax.conv_dimension_numbers(
                h.shape, w.shape, ("NHWC", "HWIO", "NHWC")
            )
            h = jax.lax.conv_general_dilated(
                h, jnp.flip(w, axis=(0, 1)), (1, 1), ((1, 2), (1, 2)),
                lhs_dilation=(2, 2), dimension_numbers=dn,
            ) + b
            h = jax.nn.relu(instance_norm(h))
        return h

    def back(self, h: jax.Array) -> jax.Array:
        """normal-domain (H/2, W/2, Clast) -> fine output with tanh."""
        hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = conv_valid(hp, self.uplast_w) + self.uplast_b
        y = jax.nn.relu(instance_norm_s2d(y))
        y_fine = depth_to_space(y)
        yp = space_to_depth(reflect_pad(y_fine, 3))
        out = jnp.tanh(conv_valid(yp, self.tail_w) + self.tail_b)
        return depth_to_space(out)

    # -- full passes ----------------------------------------------------
    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.mid_down(self.front(x))
        if self.binarize == "before_res":
            h = self.apply_binarizer(h)
        if self.binarize == "mid":
            h = self.apply_binarizer(h)
        h = self.res_blocks(h)
        if self.binarize == "after_res":
            h = self.apply_binarizer(h)
        return self.back(self.mid_up(h))

    def encode(self, x: jax.Array) -> jax.Array:
        if self.binarize == "none":
            raise ValueError("no binarizer in this trunk")
        h = self.mid_down(self.front(x))
        if self.binarize in ("before_res", "mid"):
            return self.apply_binarizer(h)
        h = self.res_blocks(h)
        return self.apply_binarizer(h)


class FastCodec:
    """Optimized deterministic inference over trained SemanticCodec params."""

    def __init__(self, cfg: Config, params_g: Dict, dtype=None):
        m = cfg.model
        if m.netG != "global" or m.netE_groups != 1 or m.inst_wise_pool or m.sem_masking:
            raise ValueError("FastCodec supports the global/ungrouped configuration")
        self.cfg = cfg
        dtype = dtype or (
            jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
        )
        g_bin = "none"
        if not m.no_generator_binarization:
            g_bin = "before_res" if m.bin_generator_before_res else "after_res"
        self.netG = _FastTrunk(
            params_g["netG"], m.n_downsample_global, m.n_blocks_global, g_bin, dtype
        )
        self.netE = None
        if cfg.use_netE:
            self.netE = _FastTrunk(
                params_g["netE"], m.n_downsample_E, 0,
                "mid" if not m.no_encoder_binarization else "none", dtype,
            )
        self.netE4label = None
        if cfg.use_netE4label:
            self.netE4label = _FastTrunk(
                params_g["netE4label"], m.n_downsample_E4label, 0,
                "mid" if not m.no_label_encoder_binarization else "none", dtype,
            )

    def decode(self, batch: Dict[str, jax.Array]) -> jax.Array:
        cfg, m = self.cfg, self.cfg.model
        inputs = prepare_inputs(
            cfg, batch.get("label"), batch.get("instance"), batch["image"],
            batch.get("compressed"),
        )
        input_label = inputs["input_label"]
        vis = inputs["compressed_img"] if cfg.codec.use_compressed else inputs["real_image"]
        if self.netE4label is not None:
            input_label = self.netE4label(input_label)
        feat = None
        if not m.no_feat:
            feat = self.netE(vis) if self.netE is not None else vis
        if feat is None:
            concat = input_label
        elif input_label is None:
            concat = feat
        else:
            concat = jnp.concatenate(
                [input_label, feat.astype(input_label.dtype)], axis=-1
            )
        return self.netG(concat)

    def get_codes(self, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        cfg, m = self.cfg, self.cfg.model
        inputs = prepare_inputs(
            cfg, batch.get("label"), batch.get("instance"), batch["image"],
            batch.get("compressed"),
        )
        codes = []

        def flat01(c):
            return (c.reshape(c.shape[0], -1) + 1.0) / 2.0

        if self.netE4label is not None and not m.no_label_encoder_binarization:
            codes.append(flat01(self.netE4label.encode(inputs["input_label"])))
        vis = inputs["compressed_img"] if cfg.codec.use_compressed else inputs["real_image"]
        if self.netE is not None and not m.no_encoder_binarization:
            codes.append(flat01(self.netE.encode(vis)))
        return codes
