"""Quantizers with straight-through gradients, as jax.custom_vjp functions +
Flax modules.

Re-designs (not ports) of the reference quantizer layer:
  * stochastic/deterministic sign STE  <- ctu/quantizers/binarize.py:13-41
  * Binarizer (1x1 conv + tanh + sign) <- ctu/quantizers/binarize.py:44-65
  * rounded_identity                   <- ctu/quantizers/round.py:8-15
  * S2HVQ / S2HVQV2 soft-to-hard VQ    <- ctu/quantizers/s2h_vq.py:13-356

All stochastic ops take explicit PRNG keys (the reference used implicit
``uniform_()`` state at binarize.py:22). Everything is jit/pjit-safe with
static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


# ----------------------------------------------------------------------
# sign with straight-through estimator
# ----------------------------------------------------------------------
@jax.custom_vjp
def stochastic_sign_ste(x: jax.Array, key: jax.Array) -> jax.Array:
    """Stochastic binarization: y in {-1, +1} with P(y=+1) = (1+x)/2.

    Forward matches binarize.py:19-24 (y=+1 iff (1-x)/2 <= u, u~U[0,1));
    backward is the identity (straight-through, binarize.py:27-28).
    """
    u = jax.random.uniform(key, x.shape, dtype=x.dtype)
    return jnp.where((1.0 - x) / 2.0 <= u, 1.0, -1.0).astype(x.dtype)


def _sss_fwd(x, key):
    return stochastic_sign_ste(x, key), None


def _sss_bwd(_, g):
    return (g, None)


stochastic_sign_ste.defvjp(_sss_fwd, _sss_bwd)


@jax.custom_vjp
def deterministic_sign_ste(x: jax.Array) -> jax.Array:
    """sign(x) with identity gradient (eval-mode path, binarize.py:41)."""
    return jnp.sign(x).astype(x.dtype)


deterministic_sign_ste.defvjp(
    lambda x: (deterministic_sign_ste(x), None), lambda _, g: (g,)
)


@jax.custom_vjp
def rounded_identity(x: jax.Array) -> jax.Array:
    """round(x) with identity gradient (compressive-AE STE, round.py:8-15).

    Both torch.round and jnp.round use round-half-to-even, so numerics match.
    """
    return jnp.round(x)


rounded_identity.defvjp(lambda x: (rounded_identity(x), None), lambda _, g: (g,))


class DifferentiableSign(nn.Module):
    """Stochastic sign in train, deterministic sign in eval
    (binarize.py:31-41)."""

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = False) -> jax.Array:
        if deterministic:
            return deterministic_sign_ste(x)
        key = self.make_rng("binarize")
        return stochastic_sign_ste(x, key)


class Binarizer(nn.Module):
    """1x1 bias-free (optionally grouped) conv + tanh + sign STE
    (binarize.py:44-54). NHWC."""

    out_channels: int
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = False) -> jax.Array:
        x = nn.Conv(
            self.out_channels,
            kernel_size=(1, 1),
            use_bias=False,
            feature_group_count=self.groups,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.02),
            name="conv",
        )(x)
        x = jnp.tanh(x)
        return DifferentiableSign(name="sign")(x, deterministic=deterministic)


# ----------------------------------------------------------------------
# soft-to-hard vector quantization (Agustsson et al.)
# ----------------------------------------------------------------------
class S2HVQ(nn.Module):
    """Soft-to-hard VQ en/decoding module (s2h_vq.py:13-342).

    The codebook ``(n_centers, center_size)`` is a learnable parameter.
    Methods mirror the reference API: ``encode`` (soft in train / hard one-hot
    in eval), ``decode`` (always hard argmax lookup — the reference found hard
    decoding works better, s2h_vq.py:185-188), plus pmf / cross-entropy rate
    estimators.
    """

    n_centers: int
    center_size: int
    sigma: float = 10.0
    codebook_init: nn.initializers.Initializer = nn.initializers.normal(1.0)

    def setup(self):
        assert self.sigma > 0
        self.codebook = self.param(
            "codebook", self.codebook_init, (self.n_centers, self.center_size)
        )

    def _score(self, x_mtrx: jax.Array) -> jax.Array:
        """Squared-L2 distance to every center (s2h_vq.py:72-89).
        x_mtrx: (n, code_len, center_size) -> (n, code_len, n_centers)."""
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 : MXU-friendly (one matmul)
        x2 = jnp.sum(x_mtrx**2, axis=-1, keepdims=True)
        c2 = jnp.sum(self.codebook**2, axis=-1)
        xc = jnp.einsum("ncd,kd->nck", x_mtrx, self.codebook)
        return x2 - 2.0 * xc + c2

    def _vec2mtrx(self, x: jax.Array, code_len: int) -> jax.Array:
        n, d = x.shape
        if d % code_len != 0 or d // code_len != self.center_size:
            raise ValueError(
                f"code_len {code_len} incompatible with d={d}, center_size={self.center_size}"
            )
        return x.reshape(n, code_len, d // code_len)

    def soft_quantize(self, x_mtrx: jax.Array) -> jax.Array:
        return jax.nn.softmax(-self.sigma * self._score(x_mtrx), axis=-1)

    def hard_quantize(self, x_mtrx: jax.Array) -> jax.Array:
        idx = jnp.argmin(self._score(x_mtrx), axis=-1)
        return jax.nn.one_hot(idx, self.n_centers, dtype=x_mtrx.dtype)

    def encode(
        self, x: jax.Array, code_len: int, train: bool = True, raw: bool = True
    ) -> jax.Array:
        """x: (n, d) -> (n, code_len, n_centers) scores if raw, else
        (n, code_len) integer indices (s2h_vq.py:257-295)."""
        x_mtrx = self._vec2mtrx(x, code_len)
        code_raw = self.soft_quantize(x_mtrx) if train else self.hard_quantize(x_mtrx)
        if raw:
            return code_raw
        return jnp.argmax(code_raw, axis=-1)

    def decode(self, code_raw: jax.Array) -> jax.Array:
        """(n, code_len, n_centers) -> (n, code_len*center_size) via hard
        argmax codebook lookup (s2h_vq.py:168-208)."""
        idx = jnp.argmax(code_raw, axis=-1)
        decoded = self.codebook[idx]  # (n, code_len, center_size)
        n = decoded.shape[0]
        return decoded.reshape(n, -1)

    def __call__(self, x: jax.Array, code_len: int, train: bool = True) -> jax.Array:
        """Quantize-dequantize round trip (encode soft/hard then decode)."""
        return self.decode(self.encode(x, code_len, train=train, raw=True))

    @staticmethod
    def get_pmf(scores: jax.Array) -> jax.Array:
        """Histogram over centers as a pmf estimate (s2h_vq.py:297-313)."""
        return jnp.sum(scores, axis=(0, 1)) / (scores.shape[0] * scores.shape[1])

    @staticmethod
    def get_cross_entropy(pmf1: jax.Array, pmf2: jax.Array) -> jax.Array:
        """H(pmf1, pmf2) in bits over centers with pmf2>0 (s2h_vq.py:315-342)."""
        safe = pmf2 > 0
        log2p = jnp.where(safe, jnp.log2(jnp.where(safe, pmf2, 1.0)), 0.0)
        return jnp.sum(jnp.where(safe, -pmf1 * log2p, 0.0))


class S2HVQV2(S2HVQ):
    """S2HVQ with a learned MLP score head instead of L2 distance
    (s2h_vq.py:344-356)."""

    def setup(self):
        super().setup()
        self.fc1 = nn.Dense(64)
        self.fc2 = nn.Dense(128)
        self.fc3 = nn.Dense(self.n_centers)

    def _score(self, x_mtrx: jax.Array) -> jax.Array:
        h = jnp.tanh(self.fc1(x_mtrx))
        h = jnp.tanh(self.fc2(h))
        return self.fc3(h)
