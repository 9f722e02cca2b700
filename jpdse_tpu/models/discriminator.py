"""PatchGAN discriminators (networks.py:371-471), Flax/NHWC.

``NLayerDiscriminator`` always returns its intermediate feature list (the
reference builds define_D with getIntermFeat=True, pix2pixHD_model.py:162-163);
``MultiscaleDiscriminator`` runs num_D of them over an avg-pool pyramid,
finest scale last in the pyramid loop exactly like the reference
(networks.py:404-419: result[i] comes from discriminator ``num_D-1-i`` on the
i-times-downsampled input).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from jpdse_tpu.models.layers import Conv, Norm, avg_pool_3s2, leaky_relu


class NLayerDiscriminator(nn.Module):
    """4x4-kernel PatchGAN (networks.py:422-471). Returns the list of
    per-layer activations [layer1, ..., prediction]."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        feats = []
        kw, padw = 4, 2  # padw = ceil((4-1)/2) (networks.py:429)
        h = Conv(self.ndf, kw, 2, padw, dtype=self.dtype, name="layer0")(x)
        h = leaky_relu(h)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = Conv(nf, kw, 2, padw, dtype=self.dtype, name=f"layer{n}")(h)
            h = Norm(self.norm, dtype=self.dtype, name=f"norm{n}")(h, train=train)
            h = leaky_relu(h)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = Conv(nf, kw, 1, padw, dtype=self.dtype, name=f"layer{self.n_layers}")(h)
        h = Norm(self.norm, dtype=self.dtype, name=f"norm{self.n_layers}")(h, train=train)
        h = leaky_relu(h)
        feats.append(h)
        h = Conv(1, kw, 1, padw, dtype=self.dtype, name="pred")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)
        return feats


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over an AvgPool(3,2,1,count_include_pad=False) pyramid
    (networks.py:371-419). Returns a list over scales of per-layer feature
    lists; ``keep_input=True`` prepends the (possibly downsampled) input to
    each scale's list (used by --match_raw_feat)."""

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2
    norm: str = "instance"
    use_sigmoid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x, keep_input: bool = False, train: bool = False
    ) -> List[List[jax.Array]]:
        results = []
        h = x
        for i in range(self.num_D):
            d = NLayerDiscriminator(
                self.ndf,
                self.n_layers,
                self.norm,
                self.use_sigmoid,
                dtype=self.dtype,
                name=f"scale{self.num_D - 1 - i}",
            )
            feats = d(h, train=train)
            if keep_input:
                feats = [h] + feats
            results.append(feats)
            if i != self.num_D - 1:
                h = avg_pool_3s2(h)
        return results
