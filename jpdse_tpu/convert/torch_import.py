"""Import reference PyTorch checkpoints (net_G.pth / net_E.pth /
net_E4label.pth / net_D.pth CPU state_dicts, written by
ctu/models/pix2pixHD_networks/base_model.py:54-59) into this framework's
parameter PyTrees.

The reference stores each network as one nn.Sequential, so keys are
positional (``model.<idx>.weight``). The index arithmetic below mirrors the
construction order in networks.py:
  GlobalGenerator (networks.py:210-247):
    0 ReflectionPad, 1 Conv7, 2 norm, 3 act, then per downsample
    [Conv3s2, norm, act], optional Binarizer, n_blocks ResnetBlock, optional
    Binarizer, per upsample [ConvT3s2, norm, act], ReflectionPad, Conv7, Tanh.
  Encoder (networks.py:312-338): same without res blocks.
  ResnetBlock.conv_block (networks.py:272-301):
    0 pad, 1 conv, 2 norm, 3 act, 4 pad, 5 conv, 6 norm  (reflect padding).
  MultiscaleDiscriminator with getIntermFeat (networks.py:379-386): weights
  live under ``scale{i}_layer{j}.<k>`` from NLayerDiscriminator's per-layer
  Sequentials (networks.py:430-456).

Weight layout conversions: Conv2d OIHW -> HWIO; ConvTranspose2d
(in, out, kh, kw) -> (kh, kw, in, out) (our ConvTranspose stores the
pre-flip kernel, matching torch's adjoint semantics — verified in
tests/test_torch_parity.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from jpdse_tpu.config import Config


def _conv(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    return out


def _convT(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32).transpose(2, 3, 0, 1)
    out = {"kernel": w}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    return out


def _state_dict(path_or_sd) -> Dict:
    if isinstance(path_or_sd, (str, os.PathLike)):
        import torch

        return torch.load(path_or_sd, map_location="cpu")
    return path_or_sd


def convert_global_generator(
    sd,
    n_downsampling: int = 4,
    n_blocks: int = 9,
    binarize: bool = False,
    bin_before_res: bool = False,
) -> Dict:
    """torch GlobalGenerator state_dict -> flax params for our
    GlobalGenerator (module names head/down{i}/res{i}/binarizer/up{i}/tail)."""
    sd = _state_dict(sd)
    p: Dict = {}
    idx = 1  # 0 is the ReflectionPad
    p["head"] = {"conv": {"conv": _conv(sd, f"model.{idx}")}}
    idx += 3  # conv, norm, act
    for i in range(n_downsampling):
        p[f"down{i}"] = {"conv": {"conv": _conv(sd, f"model.{idx}")}}
        idx += 3
    if binarize and bin_before_res:
        p["binarizer"] = {"conv": _conv(sd, f"model.{idx}.conv")}
        idx += 1
    for i in range(n_blocks):
        base = f"model.{idx}.conv_block"
        p[f"res{i}"] = {
            "conv1": {"conv": _conv(sd, f"{base}.1")},
            "conv2": {"conv": _conv(sd, f"{base}.5")},
        }
        idx += 1
    if binarize and not bin_before_res:
        p["binarizer"] = {"conv": _conv(sd, f"model.{idx}.conv")}
        idx += 1
    for i in range(n_downsampling):
        p[f"up{i}"] = {"deconv": _convT(sd, f"model.{idx}")}
        idx += 3
    idx += 1  # final ReflectionPad
    p["tail"] = {"conv": _conv(sd, f"model.{idx}")}
    return p


def convert_encoder(sd, n_downsampling: int = 4, binarize: bool = True) -> Dict:
    """torch Encoder state_dict -> flax params for our Encoder."""
    sd = _state_dict(sd)
    p: Dict = {}
    idx = 1
    p["head"] = {"conv": {"conv": _conv(sd, f"model.{idx}")}}
    idx += 3
    for i in range(n_downsampling):
        p[f"down{i}"] = {"conv": {"conv": _conv(sd, f"model.{idx}")}}
        idx += 3
    if binarize:
        p["binarizer"] = {"conv": _conv(sd, f"model.{idx}.conv")}
        idx += 1
    for i in range(n_downsampling):
        p[f"up{i}"] = {"deconv": _convT(sd, f"model.{idx}")}
        idx += 3
    idx += 1
    p["tail"] = {"conv": _conv(sd, f"model.{idx}")}
    return p


def convert_multiscale_discriminator(
    sd, num_D: int = 2, n_layers: int = 3
) -> Dict:
    """torch MultiscaleDiscriminator (getIntermFeat layout) -> flax params.

    Reference keys: scale{i}_layer{j}.<k>.weight where j indexes the per-layer
    Sequential (conv is element 0 of each). Our names: scale{i}/layer{j} for
    j <= n_layers, scale{i}/pred for the final conv.
    """
    sd = _state_dict(sd)
    p: Dict = {}
    for i in range(num_D):
        scale: Dict = {}
        for j in range(n_layers + 2):
            name = f"layer{j}" if j <= n_layers else "pred"
            scale[name] = {"conv": _conv(sd, f"scale{i}_layer{j}.0")}
        p[f"scale{i}"] = scale
    return p


def import_reference_checkpoint(
    checkpoints_dir: str, cfg: Config, template_params: Dict
) -> Dict:
    """Load net_G.pth (+net_E.pth/net_E4label.pth if configured) from a
    reference checkpoint directory into a params tree matching
    ``template_params``'s structure (missing nets keep template values)."""
    m = cfg.model
    params = dict(template_params)
    g_path = os.path.join(checkpoints_dir, "net_G.pth")
    if os.path.exists(g_path):
        params["netG"] = convert_global_generator(
            g_path,
            m.n_downsample_global,
            m.n_blocks_global,
            binarize=not m.no_generator_binarization,
            bin_before_res=m.bin_generator_before_res,
        )
    e_path = os.path.join(checkpoints_dir, "net_E.pth")
    if cfg.use_netE and os.path.exists(e_path):
        params["netE"] = convert_encoder(
            e_path, m.n_downsample_E, binarize=not m.no_encoder_binarization
        )
    e4_path = os.path.join(checkpoints_dir, "net_E4label.pth")
    if cfg.use_netE4label and os.path.exists(e4_path):
        params["netE4label"] = convert_encoder(
            e4_path, m.n_downsample_E4label, binarize=not m.no_label_encoder_binarization
        )
    return params
