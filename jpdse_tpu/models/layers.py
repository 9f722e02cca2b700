"""Layer primitives (NHWC, Flax) with exact geometric parity to the reference's
torch modules (ctu/models/pix2pixHD_networks/networks.py).

Parity traps handled here (SURVEY.md §7 "hard parts"):
  * torch Conv2d padding=p == explicit zero pad (p,p) + VALID conv — NOT XLA
    'SAME' (which pads asymmetrically (0,1) for stride 2 / kernel 3).
  * torch ConvTranspose2d(k,s,p,output_padding) == input-dilated conv with
    spatially flipped kernel and padding (k-1-p, k-1-p+output_padding).
  * InstanceNorm2d(affine=False): per-(sample, channel) stats over H,W with
    biased variance, eps=1e-5.
  * AvgPool2d(3, stride=2, padding=1, count_include_pad=False): sum pool /
    valid-element count.
  * weights_init normal(0, 0.02) (networks.py:19-25).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

conv_init = nn.initializers.normal(stddev=0.02)


def batchnorm_gamma_init(key, shape, dtype=jnp.float32):
    """weights_init for BatchNorm gamma: normal(mean=1.0, std=0.02)
    (networks.py:22-24 — `m.weight.data.normal_(1.0, 0.02)`)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """nn.ReflectionPad2d(pad), NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def replicate_pad(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d(affine=False, track_running_stats=False)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)  # biased, like torch
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Norm(nn.Module):
    """Norm factory (networks.py:27-36): instance | batch | identity."""

    kind: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                scale_init=batchnorm_gamma_init,
            )(x)
        if self.kind == "identity":
            return x
        raise NotImplementedError(f"norm [{self.kind}] not found")


class Conv(nn.Module):
    """torch-style Conv2d: zero padding `padding` on each side then VALID."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.padding
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=conv_init,
            name="conv",
        )(x)


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d(features, k, stride, padding, output_padding).

    out = (in-1)*stride - 2*padding + k + output_padding.
    Implemented as an input-dilated correlation with the spatially-flipped
    kernel — the exact adjoint of torch's Conv2d — so converted torch weights
    (in,out,kh,kw)->(kh,kw,in,out) reproduce torch outputs bit-for-bit-ish.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    groups: int = 1
    use_bias: bool = True
    # compute the transposed conv as 4 dense per-output-phase convs + one
    # depth-to-space interleave instead of an input-dilated conv (which puts
    # 3/4 zeros through the MXU). Mathematically exact for the pix2pixHD
    # geometry (k=3, s=2, p=1, op=1); other geometries fall back to dilated.
    phase_decomposed: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        if in_ch % self.groups:
            raise ValueError("groups must divide input channels")
        kernel = self.param(
            "kernel", conv_init, (k, k, in_ch // self.groups, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if (
            self.phase_decomposed
            and (k, s, p, op) == (3, 2, 1, 1)
            and self.groups == 1
        ):
            return self._phase_decomposed(x, kernel, bias)
        w = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w,
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y

    def _phase_decomposed(self, x, kernel, bias):
        """y[2i+di, 2j+dj] from the 1-D tap map (ops/s2d.py
        convT_s2_weights_to_s2d): di=0 -> g[1]; di=1 -> g[0] (this cell) +
        g[2] (next cell). One k=2 VALID conv over the input padded (0, 1)
        produces all 4 phases as channels; depth_to_space interleaves."""
        from jpdse_tpu.ops.s2d import depth_to_space

        g = jnp.flip(kernel, axis=(0, 1))  # effective correlation kernel
        cin, cout = g.shape[2], g.shape[3]
        zero = jnp.zeros_like(g[0, 0])
        taps = {0: [(0, 1)], 1: [(0, 0), (1, 2)]}  # parity -> [(cell, tap)]
        phases = []
        for di in range(2):
            for dj in range(2):
                cells = {(0, 0): zero, (0, 1): zero, (1, 0): zero, (1, 1): zero}
                for up, u in taps[di]:
                    for vp, v in taps[dj]:
                        cells[(up, vp)] = cells[(up, vp)] + g[u, v]
                phases.append(
                    jnp.stack(
                        [
                            jnp.stack([cells[(0, 0)], cells[(0, 1)]], axis=0),
                            jnp.stack([cells[(1, 0)], cells[(1, 1)]], axis=0),
                        ],
                        axis=0,
                    )
                )
        # (2, 2, cin, 4*cout), phase-major channel blocks (di*2+dj)
        wp = jnp.concatenate(phases, axis=-1).astype(self.dtype)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (0, 1), (0, 1), (0, 0)))
        dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xp, wp, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn
        )
        if bias is not None:
            y = y + jnp.tile(bias, 4).astype(self.dtype)
        return depth_to_space(y)


@functools.lru_cache(maxsize=64)
def _pool_valid_counts(h: int, w: int) -> "np.ndarray":
    """Valid-element counts of a 3x3/stride-2/pad-1 window over an (h, w)
    grid, computed at trace time (shapes are static under jit)."""
    import numpy as np

    oh, ow = (h + 2 - 3) // 2 + 1, (w + 2 - 3) // 2 + 1
    ch = np.zeros(oh, np.float32)
    cw = np.zeros(ow, np.float32)
    for i in range(oh):
        lo, hi = 2 * i - 1, 2 * i + 2
        ch[i] = min(hi, h) - max(lo, 0)
    for j in range(ow):
        lo, hi = 2 * j - 1, 2 * j + 2
        cw[j] = min(hi, w) - max(lo, 0)
    return np.outer(ch, cw)


def avg_pool_3s2(x: jax.Array) -> jax.Array:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False)
    (networks.py:180,387). Implemented as a depthwise ones-conv divided by
    the static valid-count map — differentiable and XLA-fusable (a plain
    reduce_window with a python `add` fails reverse-mode autodiff)."""
    c = x.shape[-1]
    kernel = jnp.ones((3, 3, 1, c), x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    sums = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn, feature_group_count=c
    )
    counts = jnp.asarray(_pool_valid_counts(x.shape[1], x.shape[2]), x.dtype)
    return sums / counts[None, :, :, None]


def leaky_relu(x, negative_slope=0.2):
    return nn.leaky_relu(x, negative_slope=negative_slope)


def _fused_norm(x, relu: bool = False, residual=None):
    """InstanceNorm [+ReLU] [+residual] through the Pallas TPU kernel
    (ops/pallas/instance_norm.py); numerically-identical jnp fallback off-TPU
    or when the (H, W) slab exceeds the kernel's VMEM budget."""
    from jpdse_tpu.ops.pallas.instance_norm import fused_instance_norm

    return fused_instance_norm(x, residual=residual, relu=relu)


class ConvNormAct(nn.Module):
    """conv -> norm -> activation block. With instance norm + ReLU and
    ``fused`` on, the norm+act run as one fused Pallas pass on TPU."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    norm: str = "instance"
    act: Optional[Callable] = nn.relu
    reflect: int = 0  # reflection padding applied before the conv
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.reflect:
            x = reflect_pad(x, self.reflect)
        x = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.fused and self.norm == "instance" and self.act is nn.relu:
            return _fused_norm(x, relu=True)
        x = Norm(self.norm, dtype=self.dtype, name="norm")(x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


class ResnetBlock(nn.Module):
    """pix2pixHD residual block (networks.py:266-305): [pad1 conv3 norm relu
    pad1 conv3 norm] + skip."""

    dim: int
    padding_type: str = "reflect"
    norm: str = "instance"
    use_dropout: bool = False
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        fused = self.fused and self.norm == "instance"
        h = x
        pad_fn, p = self._padding()
        h = pad_fn(h) if pad_fn else h
        h = Conv(self.dim, 3, padding=p, dtype=self.dtype, name="conv1")(h)
        if fused:
            h = _fused_norm(h, relu=True)
        else:
            h = Norm(self.norm, dtype=self.dtype, name="norm1")(h, train=train)
            h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=deterministic)(h)
        h = pad_fn(h) if pad_fn else h
        h = Conv(self.dim, 3, padding=p, dtype=self.dtype, name="conv2")(h)
        if fused:
            return _fused_norm(h, residual=x)
        h = Norm(self.norm, dtype=self.dtype, name="norm2")(h, train=train)
        return x + h

    def _padding(self):
        if self.padding_type == "reflect":
            return functools.partial(reflect_pad, pad=1), 0
        if self.padding_type == "replicate":
            return functools.partial(replicate_pad, pad=1), 0
        if self.padding_type == "zero":
            return None, 1
        raise NotImplementedError(f"padding [{self.padding_type}]")


def instance_wise_avg_pool(
    feats: jax.Array, inst: jax.Array, num_segments: int
) -> jax.Array:
    """Instance-wise average pooling: every pixel's feature is replaced by the
    mean feature of its instance region.

    TPU-native replacement of the reference's Python loop over np.unique ids
    (networks.py:346-357) with static-shape segment ops: O(HW) scatter-adds
    instead of O(n_instances * HW) boolean masks.

    feats: (B, H, W, C); inst: (B, H, W) or (B, H, W, 1) integer ids. Ids are
    clipped to [0, num_segments-1] — pick num_segments above the dataset's max
    instance id (Cityscapes encodes class*1000+index < 35000).
    """
    if inst.ndim == 4:
        inst = inst[..., 0]
    B, H, W, C = feats.shape
    ids = jnp.clip(inst.reshape(B, H * W).astype(jnp.int32), 0, num_segments - 1)
    flat = feats.reshape(B, H * W, C)

    def per_image(f, i):
        sums = jax.ops.segment_sum(f, i, num_segments)
        cnts = jax.ops.segment_sum(jnp.ones((H * W, 1), f.dtype), i, num_segments)
        means = sums / jnp.maximum(cnts, 1.0)
        return jnp.take(means, i, axis=0)

    return jax.vmap(per_image)(flat, ids).reshape(B, H, W, C)
