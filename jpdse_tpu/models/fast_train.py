"""Fast TRAIN path: the space-to-depth codec re-expression, differentiable.

Round-4 VERDICT ask #3: the s2d fast path bought decode +58% but was
inference-only — the train step still ran every trunk through the
standard layout. The s2d weight transforms are exact linear re-layouts
(ops/s2d.py), so they are differentiable: this module applies their jnp
twins to the LIVE parameters inside the jitted step and runs the full
decode — netE4label, netE, netG — in the s2d domain, forward AND
backward. Gradients flow through the transforms back to the
standard-layout parameter tree, so the optimizer state, checkpoints, and
every other consumer see the exact same parameters as the standard path.
The train-stage ledger (PERF.md round-5) motivated this: the G-side
forward/backward is 81% of the step, and the full-resolution stages'
backward shapes (thin-channel dL/dx convs) are precisely the N-starved
geometry the s2d layout fixes.

Train-mode binarizers are supported (1x1 conv + tanh + stochastic sign
STE, ops/quantizers.py): the stochastic keys are folded per trunk from
the step rng. NOTE: the noise STREAM differs from the standard path's
flax per-module rng fold — same distribution, different draws — so
training trajectories are statistically, not bitwise, identical;
the deterministic-binarization forward and all gradients are pinned
equal by tests/test_fast_train.py.

Reference hot loop this accelerates: pix2pixHD_trainer.py:42-85 /
pix2pixHD_model.py:709-771 (the G forward inside get_train_loss).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.config import Config
from jpdse_tpu.models.fast_trunk import _FastTrunk
from jpdse_tpu.models.layers import instance_norm, reflect_pad
from jpdse_tpu.ops.quantizers import deterministic_sign_ste, stochastic_sign_ste
from jpdse_tpu.ops.s2d import (
    conv_s1_weights_to_s2d_jnp,
    conv_s2_weights_from_s2d_nopad_jnp,
    conv_valid,
    convT_s2_weights_to_s2d_jnp,
    weights_tap_split_jnp,
    weights_tap_split_w_jnp,
)


def fast_train_ineligible_reason(cfg: Config) -> Optional[str]:
    """None when the config can train through the s2d codec; else why."""
    m = cfg.model
    if m.netG != "global":
        return "netG != global (the LocalEnhancer pyramid is inference-only)"
    if not m.no_generator_binarization:
        return "generator binarizer in the decode (resume-from-code split)"
    if m.sem_masking or m.use_netE_output:
        return "sem_masking / use_netE_output assembly not re-expressed"
    if m.norm != "instance":
        return "only instance norm is re-expressed (instance_norm_s2d)"
    if m.use_dropout:
        return "dropout in res blocks (train-mode rng path)"
    if m.fused_instance_norm or m.phase_deconv:
        return "fused-IN / phase-deconv variants not re-expressed"
    if cfg.use_netE and (m.netE_groups != 1 or m.inst_wise_pool):
        return "grouped / instance-pooled visual encoder not re-expressed"
    return None


def _zeros_like_shapes(tree):
    return jax.tree.map(lambda s: np.zeros(s.shape, np.float32), tree)


def _conv_wb(node):
    return node["conv"]["kernel"], node["conv"]["bias"]


def _trunk_transforms(p: Dict, trunk: _FastTrunk, n_down: int, n_blocks: int,
                      dtype, has_bin: bool) -> Dict:
    """jnp twin of _FastTrunk.__init__'s weight construction for the
    variant decisions the skeleton ``trunk`` made (layout parity pinned by
    tests/test_fast_train.py)."""
    w: Dict = {}
    w7, b7 = _conv_wb(p["head"]["conv"])
    w["head_w"] = conv_s1_weights_to_s2d_jnp(w7).astype(dtype)
    w["head_b"] = jnp.tile(b7, 4).astype(dtype)
    w_d0, b_d0 = _conv_wb(p["down0"]["conv"])
    w["down0_w"] = conv_s2_weights_from_s2d_nopad_jnp(w_d0).astype(dtype)
    w["down0_b"] = b_d0.astype(dtype)
    for i in range(1, n_down):
        wi, bi = _conv_wb(p[f"down{i}"]["conv"])
        w[f"down{i}_w"] = wi.astype(dtype)
        w[f"down{i}_b"] = bi.astype(dtype)
    for i in range(n_blocks):
        blk = p[f"res{i}"]
        w1, b1 = _conv_wb(blk["conv1"])
        w2, b2 = _conv_wb(blk["conv2"])
        w[f"res{i}_w1"] = w1.astype(dtype)
        w[f"res{i}_b1"] = b1.astype(dtype)
        w[f"res{i}_w2"] = w2.astype(dtype)
        w[f"res{i}_b2"] = b2.astype(dtype)
    for i in range(n_down - 1):
        w[f"up{i}_w"] = p[f"up{i}"]["deconv"]["kernel"].astype(dtype)
        w[f"up{i}_b"] = p[f"up{i}"]["deconv"]["bias"].astype(dtype)
    last = n_down - 1
    g = jnp.flip(p[f"up{last}"]["deconv"]["kernel"], axis=(0, 1))
    w["uplast_w"] = convT_s2_weights_to_s2d_jnp(g).astype(dtype)
    w["uplast_b"] = jnp.tile(p[f"up{last}"]["deconv"]["bias"], 4).astype(dtype)
    wt, bt = p["tail"]["conv"]["kernel"], p["tail"]["conv"]["bias"]
    wt_p = conv_s1_weights_to_s2d_jnp(wt)
    if trunk.tail_split == "full":
        w["tail_w"] = weights_tap_split_jnp(wt_p).astype(dtype)
    elif trunk.tail_split == "w":
        w["tail_w"] = weights_tap_split_w_jnp(wt_p, trunk.tail_wgroup).astype(dtype)
    else:
        w["tail_w"] = wt_p.astype(dtype)
    w["tail_b"] = jnp.tile(bt, 4).astype(dtype)
    if has_bin:
        w["bin_w"] = p["binarizer"]["conv"]["kernel"].astype(dtype)
    return w


class _TrainTrunk:
    """One codec trunk through the s2d train path: skeleton-driven stage
    forwards (reusing _FastTrunk's methods) + per-stage jax.checkpoint
    (the block-granular remat the standard path gets from nn.remat)."""

    def __init__(self, trunk: _FastTrunk, n_down: int, n_blocks: int,
                 binarize: str, use_remat: bool, dtype):
        self.trunk = trunk
        self.n_down = n_down
        self.n_blocks = n_blocks
        self.binarize = binarize
        self.dtype = dtype

        def ckpt(fn):
            return jax.checkpoint(fn) if use_remat else fn

        self.front = ckpt(trunk.front)
        self.mid_down = ckpt(trunk.mid_down)
        self.mid_up = ckpt(trunk.mid_up)
        self.back = ckpt(functools.partial(trunk.back, keep_s2d=False))

        def res_block(w, h, i):
            r = conv_valid(reflect_pad(h, 1), w[f"res{i}_w1"]) + w[f"res{i}_b1"]
            r = jax.nn.relu(instance_norm(r))
            r = conv_valid(reflect_pad(r, 1), w[f"res{i}_w2"]) + w[f"res{i}_b2"]
            return h + instance_norm(r)

        self.res_fns = [
            ckpt(functools.partial(res_block, i=i)) for i in range(n_blocks)
        ]

    def _binarizer(self, w, h, rng, deterministic):
        """Train-mode Binarizer (ops/quantizers.py: 1x1 bias-free conv +
        tanh + sign STE; stochastic in train)."""
        z = jnp.tanh(conv_valid(h, w["bin_w"]))
        if deterministic or rng is None:
            return deterministic_sign_ste(z)
        return stochastic_sign_ste(z, rng)

    def __call__(self, w, x, rng=None, deterministic=True):
        h = self.front(w, x)
        h = self.mid_down(w, h)
        if self.binarize in ("before_res", "mid"):
            h = self._binarizer(w, h, rng, deterministic)
        for fn in self.res_fns:
            h = fn(w, h)
        if self.binarize == "after_res":
            h = self._binarizer(w, h, rng, deterministic)
        h = self.mid_up(w, h)
        return self.back(w, h)


def make_fast_train_decode(cfg: Config, codec):
    """(params_g, inputs, rng, deterministic) -> (fake, input_label): the
    s2d-domain train decode. Raises ValueError (with the gate that failed)
    for ineligible configs — callers check fast_train_ineligible_reason
    first for a soft path."""
    reason = fast_train_ineligible_reason(cfg)
    if reason is not None:
        raise ValueError(f"optim.fast_train unavailable: {reason}")
    m = cfg.model
    dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32

    # shape skeletons (no real weights, no device work): they carry the
    # structure decisions (head_kp, tail_split mode) + stage forwards.
    # Input shapes come from prepare_inputs on a tiny zeros batch so every
    # configuration's channel arithmetic is exercised by the real code.
    from jpdse_tpu.models.codec import prepare_inputs

    hw = (1, 16, 32)
    dummy = prepare_inputs(
        cfg,
        None if m.no_label else jnp.zeros(hw, jnp.float32),
        None if m.no_instance else jnp.zeros(hw, jnp.float32),
        jnp.zeros(hw + (m.input_nc,), jnp.float32),
        jnp.zeros(hw + (m.input_nc,), jnp.float32)
        if cfg.codec.use_compressed
        else None,
    )
    rngs = {
        "params": jax.random.PRNGKey(0),
        "binarize": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    var_shapes = jax.eval_shape(lambda: codec.init(rngs, dummy))
    zeros = _zeros_like_shapes(var_shapes["params"])
    # train-safe variant config: no Pallas (pallas_call has no VJP), no
    # folds; tap-split stays (slices + adds differentiate fine)
    fp = m.fast.resolved()
    fp.head_pallas = "0"
    fp.head_fold = False
    fp.fused_realign = "0"
    fp.front_realign = "0"
    use_remat = cfg.optim.remat and cfg.optim.remat_granularity == "block"

    def build(name, n_down, n_blocks, binarize):
        skel = _FastTrunk(
            zeros[name], n_down, n_blocks, binarize, dtype,
            sharded=False, fp=fp,
        )
        tt = _TrainTrunk(skel, n_down, n_blocks, binarize, use_remat, dtype)
        xform = functools.partial(
            _trunk_transforms, trunk=skel, n_down=n_down, n_blocks=n_blocks,
            dtype=dtype, has_bin=binarize != "none",
        )
        return tt, xform

    netG, netG_w = build("netG", m.n_downsample_global, m.n_blocks_global, "none")
    netE = netE_w = None
    if cfg.use_netE:
        netE, netE_w = build(
            "netE", m.n_downsample_E, 0,
            "none" if m.no_encoder_binarization else "mid",
        )
    netE4label = netE4label_w = None
    if cfg.use_netE4label:
        netE4label, netE4label_w = build(
            "netE4label", m.n_downsample_E4label, 0,
            "none" if m.no_label_encoder_binarization else "mid",
        )

    def decode(params_g, inputs, rng=None, deterministic=True):
        """Mirrors SemanticCodec._generator_input + netG
        (pix2pixHD_model.py:545-610) through the s2d trunks."""
        input_label = inputs["input_label"]
        if netE4label is not None:
            input_label = netE4label(
                netE4label_w(params_g["netE4label"]),
                input_label,
                None if rng is None else jax.random.fold_in(rng, 101),
                deterministic,
            )
        feat_map = None
        if not m.no_feat:
            vis = (
                inputs["compressed_img"]
                if cfg.codec.use_compressed
                else inputs["real_image"]
            )
            if m.no_feat_encoding:
                feat_map = vis
            else:
                feat_map = netE(
                    netE_w(params_g["netE"]),
                    vis,
                    None if rng is None else jax.random.fold_in(rng, 102),
                    deterministic,
                )
            if m.zero_vis:
                feat_map = jnp.zeros_like(feat_map)
        if m.zero_sem and input_label is not None:
            input_label = jnp.zeros_like(input_label)
        elif m.zero_ins and not m.no_instance and input_label is not None:
            input_label = input_label.at[..., -1:].set(0.0)
        if feat_map is None:
            concat = input_label
        elif input_label is None:
            concat = feat_map
        else:
            concat = jnp.concatenate(
                [input_label, feat_map.astype(input_label.dtype)], axis=-1
            )
        fake = netG(netG_w(params_g["netG"]), concat)
        return fake, input_label

    return decode
