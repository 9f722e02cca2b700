"""GAN / feature-matching / perceptual losses.

Re-designs of networks.py:80-139 (GANLoss, VGGLoss) and the feature-matching
loop in get_train_loss (pix2pixHD_model.py:745-753), as pure functions. The
reference's cached target tensors (networks.py:94-110) are unnecessary under
XLA — constants fold.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

VGG_SLICE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def _single_gan_loss(pred: jax.Array, target: float, use_lsgan: bool) -> jax.Array:
    if use_lsgan:
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)
    p = jnp.clip(pred.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def gan_loss(
    preds: List[List[jax.Array]], target_is_real: bool, use_lsgan: bool = True
) -> jax.Array:
    """LSGAN-MSE (or BCE) on the final prediction of every scale, summed over
    scales (networks.py:112-122)."""
    target = 1.0 if target_is_real else 0.0
    loss = 0.0
    for scale in preds:
        loss = loss + _single_gan_loss(scale[-1], target, use_lsgan)
    return loss


def feature_matching_loss(
    pred_fake: List[List[jax.Array]],
    pred_real: List[List[jax.Array]],
    num_D: int,
) -> jax.Array:
    """L1 over all intermediate D features (everything but the final
    prediction), real side detached, scaled by 1/num_D
    (pix2pixHD_model.py:745-753 with feat_weights=1.0)."""
    loss = 0.0
    d_w = 1.0 / num_D
    for pf, pr in zip(pred_fake, pred_real):
        for f, r in zip(pf[:-1], pr[:-1]):
            loss = loss + d_w * jnp.mean(
                jnp.abs(f.astype(jnp.float32) - jax.lax.stop_gradient(r).astype(jnp.float32))
            )
    return loss


def vgg_loss(vgg_apply, fake: jax.Array, real: jax.Array) -> jax.Array:
    """5-slice VGG19 feature L1 with weights [1/32..1], target detached
    (networks.py:124-139). ``vgg_apply(x) -> [relu1_1..relu5_1]``."""
    f_feats = vgg_apply(fake)
    r_feats = vgg_apply(jax.lax.stop_gradient(real))
    loss = 0.0
    for w, f, r in zip(VGG_SLICE_WEIGHTS, f_feats, r_feats):
        loss = loss + w * jnp.mean(
            jnp.abs(f.astype(jnp.float32) - jax.lax.stop_gradient(r).astype(jnp.float32))
        )
    return loss


def vgg_loss_chunked(
    vgg_apply, fake: jax.Array, real: jax.Array, chunk: int
) -> jax.Array:
    """:func:`vgg_loss` evaluated ``chunk`` images at a time under
    ``jax.lax.map`` — mathematically identical (each slice loss is a
    ``jnp.mean`` over equally-shaped chunks, so the mean of chunk means equals
    the full-batch mean), but the VGG activations (fp32, the peak-memory
    driver of the GAN step at 1024x512) only ever exist for one chunk.
    ``chunk`` is clamped to the largest divisor of the batch size."""
    b = fake.shape[0]
    if chunk <= 0 or chunk >= b:
        return vgg_loss(vgg_apply, fake, real)
    while b % chunk != 0:
        chunk -= 1
    n = b // chunk
    fr = fake.reshape(n, chunk, *fake.shape[1:])
    rr = real.reshape(n, chunk, *real.shape[1:])
    losses = jax.lax.map(lambda p: vgg_loss(vgg_apply, p[0], p[1]), (fr, rr))
    return jnp.mean(losses)


def distortion_loss(fake: jax.Array, real: jax.Array, kind: str = "l1") -> jax.Array:
    f = fake.astype(jnp.float32)
    r = real.astype(jnp.float32)
    if kind == "l1":
        return jnp.mean(jnp.abs(f - r))
    if kind == "mse":
        return jnp.mean((f - r) ** 2)
    raise ValueError(f"unknown distortion loss {kind}")
