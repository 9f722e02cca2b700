"""Functional GAN fake-image replay buffer (ctu/utils/image_pool.py:12-39).

The reference's ImagePool mutates a Python list with host randomness; here the
pool is a fixed-size device array living in the train step's state so the
whole step stays jitted. Semantics match: while the pool is filling, the
incoming fake passes through and is stored; once full, each image is either
swapped with a random stored one (p=0.5, returning the stored image) or
passed through. pool_size=0 (the reference default, pix2pixHD_model.py:28) is
the identity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ImagePoolState:
    images: jax.Array  # (pool_size, H, W, C)
    num_imgs: jax.Array  # int32 scalar


def init_pool(pool_size: int, image_shape: Tuple[int, ...]) -> ImagePoolState:
    return ImagePoolState(
        images=jnp.zeros((pool_size, *image_shape), jnp.float32),
        num_imgs=jnp.asarray(0, jnp.int32),
    )


def query(
    state: ImagePoolState, images: jax.Array, key: jax.Array
) -> Tuple[ImagePoolState, jax.Array]:
    """Run a batch of (already detached) fakes through the pool."""
    pool_size = state.images.shape[0]
    if pool_size == 0:
        return state, images

    def per_image(carry, inp):
        pool, n = carry
        img, k = inp
        k1, k2 = jax.random.split(k)

        def fill(_):
            slot = jnp.minimum(n, pool_size - 1)
            return pool.at[slot].set(img), n + 1, img

        def maybe_swap(_):
            use_old = jax.random.uniform(k1) > 0.5
            rid = jax.random.randint(k2, (), 0, pool_size)

            def swap(_):
                old = pool[rid]
                return pool.at[rid].set(img), n, old

            def passthrough(_):
                return pool, n, img

            return jax.lax.cond(use_old, swap, passthrough, None)

        pool, n, out = jax.lax.cond(n < pool_size, fill, maybe_swap, None)
        return (pool, n), out

    keys = jax.random.split(key, images.shape[0])
    (pool, n), outs = jax.lax.scan(
        per_image, (state.images, state.num_imgs), (images, keys)
    )
    return ImagePoolState(images=pool, num_imgs=n), outs
