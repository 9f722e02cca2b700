"""The semantics-aware codec model.

Re-design of Pix2PixHDModel (ctu/models/pix2pixHD_model.py:19-805): the same
channel-arithmetic network assembly (:117-183) and data flow, but the
mode-string ``forward(x_dict, opt, mode=...)`` dispatch (:231-245) becomes
explicit pure methods over a parameter PyTree:

  * ``decode``       <- _get_img(mode='get_continuous_img') (:508-618)
  * ``get_codes``    <- _get_img(mode='get_binary_code')    (:548-618)
  * inputs prepared by :func:`prepare_inputs` <- preprocess (:362-448)

Ablation switches zero_sem / zero_ins / zero_vis (:583-606) are static config
so XLA sees constants. NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from jpdse_tpu.config import Config
from jpdse_tpu.models.discriminator import MultiscaleDiscriminator
from jpdse_tpu.models.generator import Encoder, GlobalGenerator, LocalEnhancer
from jpdse_tpu.ops.semantics import degrade_ids, prepare_semantics, sem_mask


def prepare_inputs(
    cfg: Config,
    label: Optional[jax.Array],
    instance: Optional[jax.Array],
    image: jax.Array,
    compressed: Optional[jax.Array] = None,
) -> Dict[str, Optional[jax.Array]]:
    """Jit-able preprocessing (pix2pixHD_model.py:362-448): one-hot label +
    edge concat, optional semantic masking. The external-codec compression
    producing ``compressed`` happens host-side in the input pipeline (the
    reference forked bpgenc/bpgdec per image inside the step, :317-318).

    Returns dict(input_label, real_image, instance_ids, masked_img,
    compressed_img) with None for unused entries.
    """
    m = cfg.model
    f = cfg.codec.sem_downsample
    if f > 1:
        # reduced-rate semantics: the model only ever sees the blocky
        # down-then-up maps — exactly what a receiver reconstructs from the
        # .jpds small-map sections (codec_io._upsample_side_maps)
        label = degrade_ids(label, f)
        instance = degrade_ids(instance, f)
    label_tensor = prepare_semantics(
        label,
        instance,
        cfg.data.semantic_nc,
        no_label=m.no_label,
        no_instance=m.no_instance,
        dtype=image.dtype,
    )
    masked = None
    if m.sem_masking:
        vis = compressed if cfg.codec.use_compressed else image
        masked = sem_mask(vis, label_tensor, m.binary_mask, m.input_nc)
    return {
        "input_label": label_tensor,
        "real_image": image,
        "instance_ids": instance,
        "masked_img": masked,
        "compressed_img": compressed,
    }


class SemanticCodec(nn.Module):
    """netG + optional netE (visuals) + optional netE4label (semantics),
    assembled per the config's channel arithmetic (Config.netG_input_nc etc.,
    mirroring pix2pixHD_model.py:117-183)."""

    cfg: Config

    def setup(self):
        cfg, m = self.cfg, self.cfg.model
        cfg.validate()
        dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
        # block-granular remat (generator.py setup; optim.remat_granularity)
        remat = cfg.optim.remat and cfg.optim.remat_granularity == "block"
        if m.netG == "global":
            self.netG = GlobalGenerator(
                cfg.netG_input_nc,
                cfg.data.num_out_channels,
                m.ngf,
                m.n_downsample_global,
                m.n_blocks_global,
                m.norm,
                binarize=not m.no_generator_binarization,
                binarizer_out_channels=m.generator_binarizer_out_channels,
                bin_before_res=m.bin_generator_before_res,
                use_dropout=m.use_dropout,
                fused=m.fused_instance_norm,
                phase_deconv=m.phase_deconv,
                remat=remat,
                dtype=dtype,
                name="netG",
            )
        elif m.netG == "local":
            if not m.no_generator_binarization:
                raise ValueError("local enhancers do not support binarization "
                                 "(pix2pixHD_model.py:68 help text)")
            self.netG = LocalEnhancer(
                cfg.netG_input_nc,
                cfg.data.num_out_channels,
                m.ngf,
                m.n_downsample_global,
                m.n_blocks_global,
                m.n_local_enhancers,
                m.n_blocks_local,
                m.norm,
                fused=m.fused_instance_norm,
                phase_deconv=m.phase_deconv,
                remat=remat,
                dtype=dtype,
                name="netG",
            )
        else:
            raise ValueError(f"unknown netG {m.netG}")

        if cfg.use_netE:
            self.netE = Encoder(
                cfg.netE_input_nc,
                m.feat_num,
                m.nef,
                m.n_downsample_E,
                m.norm,
                binarize=not m.no_encoder_binarization,
                binarizer_out_channels=m.encoder_binarizer_out_channels,
                groups=m.netE_groups,
                fused=m.fused_instance_norm,
                phase_deconv=m.phase_deconv,
                remat=remat,
                dtype=dtype,
                name="netE",
            )
        if cfg.use_netE4label:
            self.netE4label = Encoder(
                cfg.netE4label_input_nc,
                m.label_encoder_out_channels,
                m.ne4lf,
                m.n_downsample_E4label,
                m.norm,
                binarize=not m.no_label_encoder_binarization,
                binarizer_out_channels=m.label_encoder_binarizer_out_channels,
                fused=m.fused_instance_norm,
                phase_deconv=m.phase_deconv,
                remat=remat,
                dtype=dtype,
                name="netE4label",
            )

    # ------------------------------------------------------------------
    def _generator_input(self, inputs, train: bool, deterministic: bool):
        """Assemble the generator's input tensor (pix2pixHD_model.py:545-606).
        Returns (input_concat, input_label_after_encoding)."""
        cfg, m = self.cfg, self.cfg.model
        input_label = inputs["input_label"]
        real_image = inputs["real_image"]
        if cfg.codec.use_compressed:
            real_image = inputs["compressed_img"]
        if m.sem_masking:
            real_image = inputs["masked_img"]

        if cfg.use_netE4label:
            input_label = self.netE4label(
                input_label, train=train, deterministic=deterministic
            )

        feat_map = None
        raw_feat = None
        if not m.no_feat:
            if m.no_feat_encoding:
                feat_map = real_image
            else:
                feat_map = self.netE(
                    real_image,
                    inst=inputs["instance_ids"],
                    inst_wise_pool=m.inst_wise_pool,
                    num_segments=m.max_instance_id,
                    train=train,
                    deterministic=deterministic,
                )
            raw_feat = feat_map  # pre-ablation encoder output (use_netE_output)
            if m.zero_vis:
                feat_map = jnp.zeros_like(feat_map)

        if m.zero_sem and input_label is not None:
            input_label = jnp.zeros_like(input_label)
        elif m.zero_ins and not m.no_instance and input_label is not None:
            # edge map rides as the last channel (pix2pixHD_model.py:588-592)
            input_label = input_label.at[..., -1:].set(0.0)

        if feat_map is None:
            concat = input_label
        elif m.sem_masking:
            concat = feat_map
        elif input_label is None:
            concat = feat_map
        else:
            concat = jnp.concatenate([input_label, feat_map], axis=-1)
        return concat, input_label, raw_feat

    def decode(self, inputs, train: bool = False, deterministic: bool = True):
        """Full reconstruction path. Returns (fake_image, input_label) like
        _get_img (pix2pixHD_model.py:608-610)."""
        m = self.cfg.model
        concat, input_label, raw_feat = self._generator_input(inputs, train, deterministic)
        if m.use_netE_output:
            # short-circuit the generator: the visual encoder output is the
            # reconstruction (pix2pixHD_model.py:571-572)
            return raw_feat, input_label
        fake = self.netG(concat, train=train, deterministic=deterministic)
        return fake, input_label

    def __call__(self, inputs, train: bool = False, deterministic: bool = True):
        return self.decode(inputs, train=train, deterministic=deterministic)

    def get_codes(self, inputs, deterministic: bool = True) -> List[jax.Array]:
        """Binary codes from every binarized module, flattened to (B, n_bits)
        in {0,1} (pix2pixHD_model.py:548-618: (code+1)/2)."""
        return [
            c.reshape(c.shape[0], -1)
            for c in self.get_codes_shaped(inputs, deterministic=deterministic)
        ]

    def decode_from_codes(
        self,
        codes: List[jax.Array],
        side_inputs: Optional[Dict[str, Optional[jax.Array]]] = None,
        train: bool = False,
    ):
        """Deploy-time decoder side: reconstruct the image from the bitstream
        content alone. Learned (binarized) branches resume from their codes;
        raw branches (the reference's flagship recipe: raw one-hot semantics
        + base-codec visuals, scripts/pix2pixHD_bpg_train.sh:5-7) read from
        ``side_inputs`` — a prepare_inputs dict built from the .jpds side-info
        sections (codec_io.SideInfo). The reference never had any of this —
        its test.py dumped codes but could not decode them back
        (test.py:98-110).

        ``codes``: (B, h, w, C) arrays in {0, 1}, in get_codes_shaped order.
        """
        cfg, m = self.cfg, self.cfg.model
        if not m.no_generator_binarization:
            # G-bottleneck config: single code resumes the generator trunk
            code_pm1 = codes[0] * 2.0 - 1.0
            return self.netG.decode_from_code(code_pm1.astype(self.netG.dtype), train=train)

        def need_side(what):
            if side_inputs is None:
                raise ValueError(
                    f"decode_from_codes: this configuration carries {what} "
                    "outside the learned codes — pack them as .jpds side info "
                    "(codec_io.SideInfo) and pass side_inputs"
                )

        i = 0
        input_label = None
        if cfg.use_netE4label and not m.no_label_encoder_binarization:
            c = codes[i] * 2.0 - 1.0
            input_label = self.netE4label.decode_from_code(
                c.astype(self.netE4label.dtype), train=train)
            i += 1
        elif not m.no_label and not m.sem_masking:
            # (under sem_masking the label only shapes masked_img below)
            need_side("raw semantics (label/instance maps)")
            input_label = side_inputs["input_label"]
            if cfg.use_netE4label:
                # label encoder without a binarizer: run it on the side input
                input_label = self.netE4label(input_label, train=train)

        feat = None
        if not m.no_feat:
            if cfg.use_netE and not m.no_encoder_binarization:
                c = codes[i] * 2.0 - 1.0
                feat = self.netE.decode_from_code(c.astype(self.netE.dtype), train=train)
                i += 1
                if m.inst_wise_pool:
                    raise ValueError("inst_wise_pool needs instance ids at decode time")
            else:
                need_side("visual features (base-codec payload)")
                vis = (
                    side_inputs["compressed_img"]
                    if cfg.codec.use_compressed
                    else side_inputs["real_image"]
                )
                if m.sem_masking:
                    vis = side_inputs["masked_img"]
                if cfg.use_netE:
                    # encoder without binarizer: run it on the side visuals
                    feat = self.netE(
                        vis,
                        inst=side_inputs.get("instance_ids"),
                        inst_wise_pool=m.inst_wise_pool,
                        num_segments=m.max_instance_id,
                        train=train,
                    )
                else:
                    feat = vis

        # assembly rules of _generator_input (pix2pixHD_model.py:545-606)
        if feat is None:
            concat = input_label
        elif m.sem_masking:
            concat = feat
        elif input_label is None:
            concat = feat
        else:
            concat = jnp.concatenate(
                [input_label, feat.astype(input_label.dtype)], axis=-1
            )
        return self.netG(concat, train=train)

    def get_codes_shaped(self, inputs, deterministic: bool = True) -> List[jax.Array]:
        """Binary codes in their native (B, h, w, C) layout, in {0,1} — the
        channel axis feeds the entropy coder's per-channel context model."""
        cfg, m = self.cfg, self.cfg.model
        codes = []

        def flat01(c):
            return (c + 1.0) / 2.0

        if cfg.use_netE4label and not m.no_label_encoder_binarization:
            codes.append(
                flat01(self.netE4label.encode(inputs["input_label"], deterministic=deterministic))
            )
        if cfg.use_netE and not m.no_encoder_binarization:
            vis = inputs["real_image"]
            if cfg.codec.use_compressed:
                vis = inputs["compressed_img"]
            if m.sem_masking:
                vis = inputs["masked_img"]
            codes.append(flat01(self.netE.encode(vis, deterministic=deterministic)))
        if not m.no_generator_binarization:
            concat, _, _ = self._generator_input(inputs, False, deterministic)
            codes.append(flat01(self.netG.encode(concat, deterministic=deterministic)))
        return codes


def build_discriminator(cfg: Config) -> MultiscaleDiscriminator:
    m = cfg.model
    dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
    return MultiscaleDiscriminator(
        ndf=m.ndf,
        n_layers=m.n_layers_D,
        num_D=m.num_D,
        norm=m.norm,
        use_sigmoid=m.no_lsgan,  # pix2pixHD_model.py:154
        dtype=dtype,
    )
