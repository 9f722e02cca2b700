"""Jit-able semantic-input transforms (NHWC).

The reference performs these on-device inside ``Pix2PixHDModel.preprocess``:
  * one-hot label scatter            <- pix2pixHD_model.py:376-387
  * instance map -> boundary edges   <- pix2pixHD_model.py:774-783 (get_edges)
  * semantic masking                 <- pix2pixHD_model.py:416-448 (sem_mask)
Here they are pure jnp functions fused into the jitted step (XLA fuses the
one-hot + concat + masking into the first conv's input pipeline).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def one_hot_label(label: jax.Array, num_channels: int, dtype=jnp.float32) -> jax.Array:
    """Integer label map -> one-hot NHWC.

    label: (B, H, W) or (B, H, W, 1) integer (or float holding integers, as the
    reference's loader produces). Values are clipped into [0, num_channels-1]
    like torch scatter_ would fault otherwise — callers remap 'unknown' to
    num_labels beforehand (ctu_dataset.py:105).
    """
    if label.ndim == 4:
        label = label[..., 0]
    label = jnp.clip(label.astype(jnp.int32), 0, num_channels - 1)
    return jax.nn.one_hot(label, num_channels, dtype=dtype)


def instance_edges(inst: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Instance-id map -> boundary edge map (both pixels adjacent to a
    boundary are marked), the TPU-native form of get_edges
    (pix2pixHD_model.py:774-783).

    inst: (B, H, W) or (B, H, W, 1) integer ids. Returns (B, H, W, 1) in {0,1}.
    """
    if inst.ndim == 3:
        inst = inst[..., None]
    diff_w = inst[:, :, 1:, :] != inst[:, :, :-1, :]
    diff_h = inst[:, 1:, :, :] != inst[:, :-1, :, :]
    zw = jnp.zeros_like(diff_w[:, :, :1, :])
    zh = jnp.zeros_like(diff_h[:, :1, :, :])
    edge = (
        jnp.concatenate([zw, diff_w], axis=2)
        | jnp.concatenate([diff_w, zw], axis=2)
        | jnp.concatenate([zh, diff_h], axis=1)
        | jnp.concatenate([diff_h, zh], axis=1)
    )
    return edge.astype(dtype)


def degrade_ids(m: Optional[jax.Array], factor: int) -> Optional[jax.Array]:
    """Nearest down-then-up of an integer id map — the decoder-side view of
    semantics shipped at 1/factor resolution (codec.sem_downsample, the
    reduced-rate semantics mode motivated by the round-4 ablation: the
    mechanism is real but 0.060 bpp overpriced). The .jpds stream stores the
    SMALL map (codec_io downsample_ids) and unpack upsamples with this same
    nearest kernel, so training and deployment see identical blocky maps.

    m: (B, H, W) or (B, H, W, 1). Non-divisible sizes are legal: the
    downsample keeps ceil(H/factor) rows (numpy ::factor semantics) and the
    upsample crops the repeat back to (H, W)."""
    if m is None or factor <= 1:
        return m
    had_c = m.ndim == 4
    x = m[..., 0] if had_c else m
    h, w = x.shape[1], x.shape[2]
    s = x[:, ::factor, ::factor]
    up = jnp.repeat(jnp.repeat(s, factor, axis=1), factor, axis=2)[:, :h, :w]
    return up[..., None] if had_c else up


def sem_mask(
    img: jax.Array, label: jax.Array, binary_mask: bool = False, img_nc: int = 3
) -> jax.Array:
    """Semantic masking (pix2pixHD_model.py:416-448), NHWC.

    img:   (B, H, W, img_nc) — or (B, H, W, L*img_nc) when the semantics-aware
           external-codec path produced one decoded image per semantic channel
           (pix2pixHD_model.py:418-433).
    label: (B, H, W, L) one-hot semantics (possibly with the edge channel).

    Returns (B, H, W, L*img_nc): channel block i is img (or ones when
    binary_mask) gated by label channel i.
    """
    B, H, W, L = label.shape
    c_in = img.shape[-1]
    if c_in > img_nc:
        if c_in // img_nc != L:
            raise ValueError(
                f"img channels {c_in} not compatible with {L} semantic channels x {img_nc}"
            )
        img_block = img.reshape(B, H, W, L, img_nc)
    else:
        img_block = jnp.broadcast_to(img[..., None, :], (B, H, W, L, img_nc))
    if binary_mask:
        img_block = jnp.ones_like(img_block)
    masked = img_block * label[..., :, None]
    return masked.reshape(B, H, W, L * img_nc)


def sem_wise_distortion(
    label: jax.Array, real: jax.Array, fake: jax.Array
) -> jax.Array:
    """Per-semantic-class mean L1 distortion diagnostic
    (pix2pixHD_model.py:646-706): for each one-hot channel, the summed |real -
    fake| over that class's pixels divided by the class's pixel count; 0 for
    absent classes.

    NOTE: the reference calls ``sem_mask(input_label, real_image, ...)`` with
    the (img, label) arguments swapped (:651-652 vs the signature at :417),
    so its worked-example outputs mix classes across image channels. This
    implements the *intended* per-class semantics instead (SURVEY.md §2
    "latent defects" policy).

    label: (B, H, W, L) one-hot; real/fake: (B, H, W, C). Returns (L,).
    """
    diff = jnp.sum(jnp.abs(real - fake), axis=-1)  # (B, H, W)
    num = jnp.einsum("bhwl,bhw->l", label, diff)
    den = jnp.sum(label, axis=(0, 1, 2))
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def prepare_semantics(
    label: Optional[jax.Array],
    instance: Optional[jax.Array],
    num_channels: int,
    no_label: bool = False,
    no_instance: bool = False,
    dtype=jnp.float32,
) -> Optional[jax.Array]:
    """One-hot label (+ concat edge channel), the jit-able core of
    Pix2PixHDModel.preprocess (pix2pixHD_model.py:376-396).

    Returns (B, H, W, num_channels [+1]) or None when both disabled.
    """
    label_tensor = None
    if not no_label:
        label_tensor = one_hot_label(label, num_channels, dtype=dtype)
    if not no_instance:
        edge = instance_edges(instance, dtype=dtype)
        label_tensor = (
            edge if label_tensor is None else jnp.concatenate([label_tensor, edge], axis=-1)
        )
    return label_tensor
