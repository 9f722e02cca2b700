"""Generators and encoders (Flax, NHWC).

Re-designs of the reference network zoo (ctu/models/pix2pixHD_networks/
networks.py): GlobalGenerator (:198-263), LocalEnhancer (:144-196), Encoder
with grouped convs and instance-wise average pooling (:307-369).

Instead of the reference's Sequential-index-slicing trick to extract binary
codes (networks.py:252-261, :361-369), each module exposes an explicit
``encode`` (trunk up to and including the binarizer) and ``decode_from_code``
split, so the deploy-time bitstream path is a first-class function.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from jpdse_tpu.models.layers import (
    ConvNormAct,
    ConvTranspose,
    Norm,
    ResnetBlock,
    _fused_norm,
    avg_pool_3s2,
    instance_wise_avg_pool,
    reflect_pad,
)
from jpdse_tpu.models.layers import Conv as TConv
from jpdse_tpu.ops.quantizers import Binarizer


class GlobalGenerator(nn.Module):
    """c7s1-ngf, n_downsampling strided convs, [binarizer], n_blocks residual
    blocks, [binarizer], mirrored transposed convs, c7s1-out + tanh
    (networks.py:198-247)."""

    input_nc: int
    output_nc: int
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    norm: str = "instance"
    padding_type: str = "reflect"
    binarize: bool = False
    binarizer_out_channels: int = 128
    bin_before_res: bool = False
    use_dropout: bool = False
    fused: bool = False
    phase_deconv: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        ngf, nd = self.ngf, self.n_downsampling
        # Block-granular rematerialization: checkpointing the WHOLE decode
        # (one jax.checkpoint around it) still holds every internal residual
        # simultaneously during the recomputed backward — measured peak at
        # batch 4/1024x512 was 3x ~1GB f32 full-res temps. Wrapping each
        # block means the backward only ever holds one block's residuals
        # plus the (bf16) block-boundary activations.
        CNA, Res, CTNA = ConvNormAct, ResnetBlock, ConvTransposeNormAct
        if self.remat:
            CNA = nn.remat(ConvNormAct, static_argnums=(2,))
            Res = nn.remat(ResnetBlock, static_argnums=(2, 3))
            CTNA = nn.remat(ConvTransposeNormAct, static_argnums=(2,))
        self.head = CNA(
            ngf, 7, reflect=3, norm=self.norm, fused=self.fused,
            dtype=self.dtype, name="head"
        )
        self.down = [
            CNA(
                ngf * (2**i) * 2, 3, stride=2, padding=1, norm=self.norm,
                fused=self.fused, dtype=self.dtype, name=f"down{i}",
            )
            for i in range(nd)
        ]
        mult = 2**nd
        res_dim = ngf * mult
        if self.binarize:
            bin_in_dim = ngf * mult if nd > 0 else ngf
            if self.bin_before_res:
                res_dim = self.binarizer_out_channels
            elif self.n_blocks > 0:
                bin_in_dim = res_dim
            self.binarizer = Binarizer(
                self.binarizer_out_channels, dtype=self.dtype, name="binarizer"
            )
            del bin_in_dim  # shape inferred by flax; retained for clarity
        self.res = [
            Res(
                res_dim, self.padding_type, self.norm, self.use_dropout,
                fused=self.fused, dtype=self.dtype, name=f"res{i}",
            )
            for i in range(self.n_blocks)
        ]
        self.up = [
            CTNA(
                int(ngf * (2 ** (nd - i)) / 2), norm=self.norm, fused=self.fused,
                phase_deconv=self.phase_deconv, dtype=self.dtype, name=f"up{i}",
            )
            for i in range(nd)
        ]
        self.tail = TConv(self.output_nc, 7, dtype=self.dtype, name="tail")

    # -- trunk pieces ---------------------------------------------------
    # (block args are positional: jax.checkpoint static_argnums requires
    # positional passing, and flax offsets them past the module instance)
    def _front(self, x, train, deterministic):
        h = self.head(x, train)
        for blk in self.down:
            h = blk(h, train)
        if self.binarize and self.bin_before_res:
            h = self.binarizer(h, deterministic=deterministic)
        # NOTE: the reference exposes --use_dropout but never passes it into
        # its ResnetBlocks (networks.py:229 vs pix2pixHD_model.py:37 — a dead
        # flag there); here it genuinely enables Dropout(0.5) in training.
        for blk in self.res:
            h = blk(h, train, deterministic)
        if self.binarize and not self.bin_before_res:
            h = self.binarizer(h, deterministic=deterministic)
        return h

    def _back(self, h, train):
        for blk in self.up:
            h = blk(h, train)
        h = reflect_pad(h, 3)
        return jnp.tanh(self.tail(h))

    def __call__(self, x, train: bool = False, deterministic: bool = True):
        return self._back(self._front(x, train, deterministic), train)

    def encode(self, x, train: bool = False, deterministic: bool = True):
        """Trunk through the binarizer: the {-1,+1} bottleneck
        (replaces the index-arithmetic slice at networks.py:252-261)."""
        if not self.binarize:
            raise AttributeError("GlobalGenerator: no binarizer found")
        h = self.head(x, train)
        for blk in self.down:
            h = blk(h, train)
        if self.bin_before_res:
            return self.binarizer(h, deterministic=deterministic)
        for blk in self.res:
            h = blk(h, train, deterministic)
        return self.binarizer(h, deterministic=deterministic)

    def decode_from_code(self, code, train: bool = False):
        """Resume the trunk after the binarizer (deploy-time decoder side)."""
        if not self.binarize:
            raise AttributeError("GlobalGenerator: no binarizer found")
        h = code
        if self.bin_before_res:
            for blk in self.res:
                h = blk(h, train, True)
        return self._back(h, train)


class ConvTransposeNormAct(nn.Module):
    """ConvTranspose2d(k3,s2,p1,op1) -> norm -> ReLU upsampling block."""

    features: int
    norm: str = "instance"
    fused: bool = False
    phase_deconv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvTranspose(
            self.features, 3, 2, 1, 1, phase_decomposed=self.phase_deconv,
            dtype=self.dtype, name="deconv",
        )(x)
        if self.fused and self.norm == "instance":
            return _fused_norm(x, relu=True)
        x = Norm(self.norm, dtype=self.dtype, name="norm")(x, train=train)
        return nn.relu(x)


class LocalEnhancer(nn.Module):
    """Coarse-to-fine enhancer pyramid for high-res generation
    (networks.py:144-196). The global trunk runs on a 2^n-downsampled input;
    each enhancer adds a downsample stack's features to the previous output
    and refines through local residual blocks + upsample.
    """

    input_nc: int
    output_nc: int
    ngf: int = 32
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    norm: str = "instance"
    padding_type: str = "reflect"
    fused: bool = False
    phase_deconv: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        ngf_global = self.ngf * (2**self.n_local_enhancers)
        LD, LU = LocalDownsample, LocalUpsample
        if self.remat:  # block-granular remat, see GlobalGenerator.setup
            LD = nn.remat(LocalDownsample, static_argnums=(2,))
            LU = nn.remat(LocalUpsample, static_argnums=(2,))
        # global trunk *without* its final reflect-pad/conv7/tanh
        # (networks.py:152-153 drops the last 3 layers)
        self.global_gen = GlobalGenerator(
            self.input_nc,
            self.output_nc,
            ngf_global,
            self.n_downsample_global,
            self.n_blocks_global,
            self.norm,
            self.padding_type,
            fused=self.fused,
            phase_deconv=self.phase_deconv,
            remat=self.remat,
            dtype=self.dtype,
            name="global",
        )
        downs, ups = [], []
        for n in range(1, self.n_local_enhancers + 1):
            ngf_g = self.ngf * (2 ** (self.n_local_enhancers - n))
            downs.append(
                LD(
                    ngf_g, self.norm, fused=self.fused, dtype=self.dtype,
                    name=f"local{n}_down",
                )
            )
            ups.append(
                LU(
                    ngf_g,
                    self.output_nc,
                    self.n_blocks_local,
                    self.norm,
                    self.padding_type,
                    final=(n == self.n_local_enhancers),
                    fused=self.fused,
                    phase_deconv=self.phase_deconv,
                    dtype=self.dtype,
                    name=f"local{n}_up",
                )
            )
        self.local_downs = downs
        self.local_ups = ups

    def __call__(self, x, train: bool = False, deterministic: bool = True):
        pyramid = [x]
        for _ in range(self.n_local_enhancers):
            pyramid.append(avg_pool_3s2(pyramid[-1]))
        # coarsest level through the global trunk (minus its tail)
        h = self.global_gen._front(pyramid[-1], train, deterministic)
        for blk in self.global_gen.up:
            h = blk(h, train)
        for n in range(self.n_local_enhancers):
            inp = pyramid[self.n_local_enhancers - 1 - n]
            h = self.local_ups[n](self.local_downs[n](inp, train) + h, train)
        return h


class LocalDownsample(nn.Module):
    ngf: int
    norm: str = "instance"
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNormAct(
            self.ngf, 7, reflect=3, norm=self.norm, fused=self.fused,
            dtype=self.dtype, name="c7",
        )(x, train=train)
        return ConvNormAct(
            self.ngf * 2, 3, stride=2, padding=1, norm=self.norm, fused=self.fused,
            dtype=self.dtype, name="d1",
        )(x, train=train)


class LocalUpsample(nn.Module):
    ngf: int
    output_nc: int
    n_blocks: int = 3
    norm: str = "instance"
    padding_type: str = "reflect"
    final: bool = False
    fused: bool = False
    phase_deconv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_blocks):
            x = ResnetBlock(
                self.ngf * 2, self.padding_type, self.norm, fused=self.fused,
                dtype=self.dtype, name=f"res{i}",
            )(x, train=train)
        x = ConvTransposeNormAct(
            self.ngf, self.norm, fused=self.fused, phase_deconv=self.phase_deconv,
            dtype=self.dtype, name="up",
        )(x, train=train)
        if self.final:
            x = reflect_pad(x, 3)
            x = TConv(self.output_nc, 7, dtype=self.dtype, name="tail")(x)
            x = jnp.tanh(x)
        return x


class Encoder(nn.Module):
    """Feature encoder (networks.py:307-369): c7s1 + n strided convs,
    [binarizer], mirrored transposed convs, c7s1 + tanh. All convs optionally
    grouped (depth-wise per-semantic-channel when sem_masking). Supports
    instance-wise average pooling of the output (networks.py:346-357) via
    static-shape segment ops."""

    input_nc: int
    output_nc: int
    ngf: int = 32
    n_downsampling: int = 4
    norm: str = "instance"
    binarize: bool = False
    binarizer_out_channels: int = 128
    groups: int = 1
    fused: bool = False
    phase_deconv: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        g = self.groups
        CNA, GCT = ConvNormAct, GroupedConvTransposeNormAct
        if self.remat:  # block-granular remat, see GlobalGenerator.setup
            CNA = nn.remat(ConvNormAct, static_argnums=(2,))
            GCT = nn.remat(GroupedConvTransposeNormAct, static_argnums=(2,))
        self.head = CNA(
            self.ngf, 7, reflect=3, groups=g, norm=self.norm, fused=self.fused,
            dtype=self.dtype, name="head"
        )
        self.down = [
            CNA(
                self.ngf * (2**i) * 2, 3, stride=2, padding=1, groups=g,
                norm=self.norm, fused=self.fused, dtype=self.dtype, name=f"down{i}",
            )
            for i in range(self.n_downsampling)
        ]
        if self.binarize:
            self.binarizer = Binarizer(
                self.binarizer_out_channels, groups=g, dtype=self.dtype, name="binarizer"
            )
        self.up = [
            GCT(
                int(self.ngf * (2 ** (self.n_downsampling - i)) / 2), g, self.norm,
                fused=self.fused, phase_deconv=self.phase_deconv,
                dtype=self.dtype, name=f"up{i}",
            )
            for i in range(self.n_downsampling)
        ]
        self.tail = TConv(self.output_nc, 7, groups=g, dtype=self.dtype, name="tail")

    def __call__(
        self,
        x,
        inst: Optional[jax.Array] = None,
        inst_wise_pool: bool = False,
        num_segments: int = 40960,
        train: bool = False,
        deterministic: bool = True,
    ):
        h = self.encode(x, train=train, deterministic=deterministic)
        out = self.decode_from_code(h, train=train)
        if inst_wise_pool:
            if inst is None:
                raise ValueError("inst_wise_pool requires instance ids")
            out = instance_wise_avg_pool(out, inst, num_segments)
        return out

    def encode(self, x, train: bool = False, deterministic: bool = True):
        h = self.head(x, train)
        for blk in self.down:
            h = blk(h, train)
        if self.binarize:
            h = self.binarizer(h, deterministic=deterministic)
        return h

    def decode_from_code(self, h, train: bool = False):
        for blk in self.up:
            h = blk(h, train)
        h = reflect_pad(h, 3)
        return jnp.tanh(self.tail(h))


class GroupedConvTransposeNormAct(nn.Module):
    features: int
    groups: int = 1
    norm: str = "instance"
    fused: bool = False
    phase_deconv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvTranspose(
            self.features, 3, 2, 1, 1, groups=self.groups,
            phase_decomposed=self.phase_deconv, dtype=self.dtype, name="deconv",
        )(x)
        if self.fused and self.norm == "instance":
            return _fused_norm(x, relu=True)
        x = Norm(self.norm, dtype=self.dtype, name="norm")(x, train=train)
        return nn.relu(x)
