"""Pallas TPU kernel: fused InstanceNorm (+ReLU) (+residual add).

The generator/encoder trunk applies InstanceNorm after every conv
(networks.py:210-247); unfused, that is a stats reduction pass plus a
normalize pass with separate ReLU/residual element-wise kernels. This kernel
does stats + normalize + activation + residual in one VMEM-resident pass per
(batch, channel-tile) grid cell, with a custom VJP (the standard instance-norm
backward) so it is usable inside the jitted training step.

Falls back to the plain jnp implementation off-TPU (CPU tests) or when the
(H, W) slab would not fit VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jpdse_tpu.models.layers import instance_norm as _jnp_instance_norm

# bytes for the input slab; the kernel holds input + f32 working copy +
# output simultaneously (~4x the slab) against the ~16MB VMEM budget
_VMEM_BUDGET = 1024 * 1024


def pallas_supported() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _channel_tile(h: int, w: int, c: int, itemsize: int) -> int:
    """Pick a channel-tile size: Mosaic requires the last block dim be a
    multiple of 128 or the full channel extent. Returns 0 when no valid tile
    fits the VMEM slab budget (caller falls back to the jnp path)."""
    candidates = [c] + [m for m in range(128, c, 128) if c % m == 0]
    fits = [ct for ct in candidates if h * w * ct * itemsize <= _VMEM_BUDGET]
    return max(fits) if fits else 0


def _kernel(relu: bool, has_res: bool, eps: float, *refs):
    if has_res:
        x_ref, res_ref, out_ref = refs
    else:
        x_ref, out_ref = refs
        res_ref = None
    x = x_ref[0].astype(jnp.float32)  # block (1, H, W, Ct) -> (H, W, Ct)
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=(0, 1), keepdims=True)
    y = centered * jax.lax.rsqrt(var + eps)
    if relu:
        y = jnp.maximum(y, 0.0)
    if res_ref is not None:
        y = y + res_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def _forward(x, residual, relu: bool, eps: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    ct = _channel_tile(h, w, c, 4)
    if ct == 0:
        raise ValueError("slab too large for VMEM")
    has_res = residual is not None

    grid = (b, c // ct)
    spec = pl.BlockSpec(
        (1, h, w, ct), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    in_specs = [spec] + ([spec] if has_res else [])
    kernel = functools.partial(_kernel, relu, has_res, eps)

    args = (x, residual) if has_res else (x,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_in(x, residual, relu: bool, eps: float):
    return _forward(x, residual, relu, eps)


def _fused_in_fwd(x, residual, relu, eps):
    y = _forward(x, residual, relu, eps)
    return y, (x, residual)


def _fused_in_bwd(relu, eps, saved, g):
    x, residual = saved
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    dres = None
    if residual is not None:
        dres = g
    if relu:
        y = jnp.maximum(xhat, 0.0)
        g32 = jnp.where(xhat > 0, g32, 0.0)
        del y
    # d/dx of instance norm: rstd * (g - mean(g) - xhat * mean(g * xhat))
    gm = jnp.mean(g32, axis=(1, 2), keepdims=True)
    gx = jnp.mean(g32 * xhat, axis=(1, 2), keepdims=True)
    dx = (rstd * (g32 - gm - xhat * gx)).astype(x.dtype)
    return dx, dres


_fused_in.defvjp(_fused_in_fwd, _fused_in_bwd)


def fused_instance_norm(
    x: jax.Array,
    residual: Optional[jax.Array] = None,
    relu: bool = False,
    eps: float = 1e-5,
    force_pallas: bool = False,
) -> jax.Array:
    """InstanceNorm(x) [+ReLU] [+residual], Pallas-fused on TPU.

    Equivalent jnp path everywhere else (and when the slab exceeds VMEM).
    """
    use_pallas = force_pallas or pallas_supported()
    if use_pallas:
        b, h, w, c = x.shape
        if _channel_tile(h, w, c, 4) > 0:
            try:
                return _fused_in(x, residual, relu, eps)
            except Exception:
                pass
    y = _jnp_instance_norm(x, eps)
    if relu:
        y = jax.nn.relu(y)
    if residual is not None:
        y = y + residual
    return y
