"""Fast TRAIN path: the space-to-depth generator re-expression, differentiable.

Round-4 VERDICT ask #3: the s2d fast path bought decode +58% but was
inference-only — the train step still ran the generator through the
standard layout. The s2d weight transforms are exact linear re-layouts
(ops/s2d.py), so they are differentiable: this module applies their jnp
twins to the LIVE parameters inside the jitted step and runs the
generator forward (and therefore its backward) in the s2d domain.
Gradients flow through the transforms back to the standard-layout
parameter tree, so the optimizer state, checkpoints, and every other
consumer see the exact same parameters as the standard path.

Scope (the flagship recipe): netG 'global' with raw semantics + raw/base
-codec visuals — no binarizers in the decode, no dropout, instance norm.
``fast_train_ineligible_reason`` documents each gate. The forward reuses
``_FastTrunk``'s stage methods (models/fast_trunk.py) on a shape-skeleton
instance, with a train-safe variant config: the Pallas re-alignment
kernels have no VJP, so the re-alignments run as the jnp d2s/pad/s2d
composition XLA differentiates (the transforms themselves are the win;
PERF.md round-5 has the measured numbers).

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
from jpdse_tpu.ops.s2d import (
    conv_s1_weights_to_s2d_jnp,
    conv_s2_weights_from_s2d_nopad_jnp,
    conv_valid,
    convT_s2_weights_to_s2d_jnp,
    weights_tap_split_jnp,
)


def fast_train_ineligible_reason(cfg: Config) -> Optional[str]:
    """None when the config can train through the s2d generator; else why."""
    m = cfg.model
    if m.netG != "global":
        return "netG != global (the LocalEnhancer pyramid is inference-only)"
    if not m.no_generator_binarization:
        return "generator binarizer in the decode (stochastic STE path)"
    if cfg.use_netE or cfg.use_netE4label:
        return "learned encoders in the decode (flagship recipe has none)"
    if m.sem_masking or m.use_netE_output:
        return "sem_masking / use_netE_output assembly not re-expressed"
    if m.norm != "instance":
        return "only instance norm is re-expressed (instance_norm_s2d)"
    if m.use_dropout:
        return "dropout in res blocks (train-mode rng path)"
    if m.fused_instance_norm or m.phase_deconv:
        return "fused-IN / phase-deconv variants not re-expressed"
    return None


def _zeros_like_shapes(tree):
    return jax.tree.map(lambda s: np.zeros(s.shape, np.float32), tree)


def make_fast_train_decode(cfg: Config, codec):
    """(params_g, inputs) -> (fake, input_label): the s2d-domain train
    decode. Raises ValueError (with the gate that failed) for ineligible
    configs — callers check fast_train_ineligible_reason first for a soft
    path."""
    reason = fast_train_ineligible_reason(cfg)
    if reason is not None:
        raise ValueError(f"optim.fast_train unavailable: {reason}")
    m = cfg.model
    dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32

    # shape skeleton (no real weights, no device work): gives _FastTrunk its
    # structure decisions (head_kp, tail_split mode) and stage methods
    import jax.numpy as _jnp

    dummy = {
        "input_label": (
            None
            if m.no_label and m.no_instance
            else _jnp.zeros((1, 16, 32, cfg.netG_input_nc - (0 if m.no_feat else m.input_nc)), _jnp.float32)
        ),
        "real_image": _jnp.zeros((1, 16, 32, m.input_nc), _jnp.float32),
        "instance_ids": None,
        "masked_img": None,
        "compressed_img": _jnp.zeros((1, 16, 32, m.input_nc), _jnp.float32)
        if cfg.codec.use_compressed
        else None,
    }
    var_shapes = jax.eval_shape(
        lambda: codec.init(jax.random.PRNGKey(0), dummy)
    )
    zeros_netg = _zeros_like_shapes(var_shapes["params"]["netG"])
    # train-safe variant config: no Pallas (pallas_call has no VJP), no
    # folds; tap-split stays (slices + adds differentiate fine)
    fp = m.fast.resolved()
    fp.head_pallas = "0"
    fp.head_fold = False
    fp.fused_realign = "0"
    fp.front_realign = "0"
    trunk = _FastTrunk(
        zeros_netg, m.n_downsample_global, m.n_blocks_global, "none",
        dtype, sharded=False, fp=fp,
    )
    assert trunk.has_front and trunk.has_back

    def conv_wb(node):
        return node["conv"]["kernel"], node["conv"]["bias"]

    def transforms(p: Dict) -> Dict:
        """The jnp twin of _FastTrunk.__init__'s weight construction for
        the variant decisions the skeleton made (layout parity pinned by
        tests/test_fast_train.py)."""
        w: Dict = {}
        w7, b7 = conv_wb(p["head"]["conv"])
        w["head_w"] = conv_s1_weights_to_s2d_jnp(w7).astype(dtype)
        w["head_b"] = jnp.tile(b7, 4).astype(dtype)
        w_d0, b_d0 = conv_wb(p["down0"]["conv"])
        w["down0_w"] = conv_s2_weights_from_s2d_nopad_jnp(w_d0).astype(dtype)
        w["down0_b"] = b_d0.astype(dtype)
        for i in range(1, m.n_downsample_global):
            wi, bi = conv_wb(p[f"down{i}"]["conv"])
            w[f"down{i}_w"] = wi.astype(dtype)
            w[f"down{i}_b"] = bi.astype(dtype)
        for i in range(m.n_blocks_global):
            blk = p[f"res{i}"]
            w1, b1 = conv_wb(blk["conv1"])
            w2, b2 = conv_wb(blk["conv2"])
            w[f"res{i}_w1"] = w1.astype(dtype)
            w[f"res{i}_b1"] = b1.astype(dtype)
            w[f"res{i}_w2"] = w2.astype(dtype)
            w[f"res{i}_b2"] = b2.astype(dtype)
        for i in range(m.n_downsample_global - 1):
            w[f"up{i}_w"] = p[f"up{i}"]["deconv"]["kernel"].astype(dtype)
            w[f"up{i}_b"] = p[f"up{i}"]["deconv"]["bias"].astype(dtype)
        last = m.n_downsample_global - 1
        g = jnp.flip(p[f"up{last}"]["deconv"]["kernel"], axis=(0, 1))
        w["uplast_w"] = convT_s2_weights_to_s2d_jnp(g).astype(dtype)
        w["uplast_b"] = jnp.tile(p[f"up{last}"]["deconv"]["bias"], 4).astype(dtype)
        wt, bt = p["tail"]["conv"]["kernel"], p["tail"]["conv"]["bias"]
        wt_p = conv_s1_weights_to_s2d_jnp(wt)
        if trunk.tail_split == "full":
            w["tail_w"] = weights_tap_split_jnp(wt_p).astype(dtype)
        else:  # RGB tails always qualify for the full split; guard anyway
            w["tail_w"] = wt_p.astype(dtype)
        w["tail_b"] = jnp.tile(bt, 4).astype(dtype)
        return w

    use_block_remat = cfg.optim.remat and cfg.optim.remat_granularity == "block"

    def ckpt(fn):
        return jax.checkpoint(fn) if use_block_remat else fn

    front = ckpt(trunk.front)
    mid_down = ckpt(trunk.mid_down)
    mid_up = ckpt(trunk.mid_up)
    back = ckpt(functools.partial(trunk.back, keep_s2d=False))

    def res_block(w, h, i):
        # one block per checkpoint — the block-granular remat the standard
        # path gets from nn.remat(ResnetBlock) (generator.py setup)
        r = conv_valid(reflect_pad(h, 1), w[f"res{i}_w1"]) + w[f"res{i}_b1"]
        r = jax.nn.relu(instance_norm(r))
        r = conv_valid(reflect_pad(r, 1), w[f"res{i}_w2"]) + w[f"res{i}_b2"]
        return h + instance_norm(r)

    res_fns = [
        ckpt(functools.partial(res_block, i=i)) for i in range(m.n_blocks_global)
    ]

    def decode(params_g, inputs):
        w = transforms(params_g["netG"])
        input_label = inputs["input_label"]
        vis = None
        if not m.no_feat:
            vis = (
                inputs["compressed_img"]
                if cfg.codec.use_compressed
                else inputs["real_image"]
            )
        if m.zero_sem and input_label is not None:
            input_label = jnp.zeros_like(input_label)
        elif m.zero_ins and not m.no_instance and input_label is not None:
            input_label = input_label.at[..., -1:].set(0.0)
        if m.zero_vis and vis is not None:
            vis = jnp.zeros_like(vis)
        if vis is None:
            concat = input_label
        elif input_label is None:
            concat = vis
        else:
            concat = jnp.concatenate(
                [input_label, vis.astype(input_label.dtype)], axis=-1
            )
        h = front(w, concat)
        h = mid_down(w, h)
        for fn in res_fns:
            h = fn(w, h)
        h = mid_up(w, h)
        fake = back(w, h)
        return fake, input_label

    return decode
