"""Reference-checkpoint import: build torch replicas with the reference's
exact Sequential layout, convert their state_dicts, and verify the flax
modules reproduce the torch outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from jpdse_tpu.convert.torch_import import (
    convert_encoder,
    convert_global_generator,
    convert_multiscale_discriminator,
)
from jpdse_tpu.models.discriminator import MultiscaleDiscriminator
from jpdse_tpu.models.generator import Encoder, GlobalGenerator

from tests.test_torch_parity import (
    TorchResnetBlock,
    build_torch_global_generator,
    from_nchw,
    to_nchw,
)

torch.manual_seed(1)


class TorchSeqModel(tnn.Module):
    """Wrap a Sequential under the reference's ``model`` attribute name so
    state_dict keys read ``model.<idx>...``."""

    def __init__(self, seq):
        super().__init__()
        self.model = seq

    def forward(self, x):
        return self.model(x)


def test_import_global_generator(rng):
    ngf, n_down, n_blocks = 8, 2, 2
    t = TorchSeqModel(build_torch_global_generator(5, 3, ngf, n_down, n_blocks))
    sd = t.state_dict()
    params = convert_global_generator(sd, n_down, n_blocks)

    x = rng.normal(size=(1, 16, 32, 5)).astype(np.float32)
    golden = from_nchw(t(to_nchw(x)))
    m = GlobalGenerator(input_nc=5, output_nc=3, ngf=ngf, n_downsampling=n_down, n_blocks=n_blocks)
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=2e-4)


def build_torch_encoder(input_nc, output_nc, ngf, n_down, bin_ch):
    """Reference Encoder layout (networks.py:312-338) with binarizer."""

    class Binarizer(tnn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.conv = tnn.Conv2d(i, o, 1, bias=False)

        def forward(self, x):
            return torch.sign(torch.tanh(self.conv(x)))

    layers = [
        tnn.ReflectionPad2d(3), tnn.Conv2d(input_nc, ngf, 7),
        tnn.InstanceNorm2d(ngf, affine=False), tnn.ReLU(True),
    ]
    for i in range(n_down):
        m = 2**i
        layers += [
            tnn.Conv2d(ngf * m, ngf * m * 2, 3, 2, 1),
            tnn.InstanceNorm2d(ngf * m * 2, affine=False), tnn.ReLU(True),
        ]
    layers.append(Binarizer(ngf * 2**n_down, bin_ch))
    up_in = bin_ch
    for i in range(n_down):
        m = 2 ** (n_down - i)
        layers += [
            tnn.ConvTranspose2d(up_in, ngf * m // 2, 3, 2, 1, output_padding=1),
            tnn.InstanceNorm2d(ngf * m // 2, affine=False), tnn.ReLU(True),
        ]
        up_in = ngf * m // 2
    layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, output_nc, 7), tnn.Tanh()]
    return TorchSeqModel(tnn.Sequential(*layers))


def test_import_encoder_with_binarizer(rng):
    ngf, n_down, bin_ch = 8, 2, 16
    t = build_torch_encoder(3, 3, ngf, n_down, bin_ch)
    params = convert_encoder(t.state_dict(), n_down, binarize=True)
    x = rng.normal(size=(1, 16, 32, 3)).astype(np.float32)
    golden = from_nchw(t(to_nchw(x)))
    m = Encoder(
        input_nc=3, output_nc=3, ngf=ngf, n_downsampling=n_down,
        binarize=True, binarizer_out_channels=bin_ch,
    )
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=2e-4)


def test_import_multiscale_discriminator(rng):
    from tests.test_torch_parity import TorchNLayerD

    num_D, n_layers, ndf = 2, 3, 8

    class TorchMultiD(tnn.Module):
        """Reference key layout: scale{i}_layer{j} (networks.py:379-386)."""

        def __init__(self):
            super().__init__()
            for i in range(num_D):
                d = TorchNLayerD(6, ndf, n_layers)
                for j in range(n_layers + 2):
                    setattr(self, f"scale{i}_layer{j}", d.blocks[j])

        def forward_scale(self, i, x):
            feats = []
            for j in range(n_layers + 2):
                x = getattr(self, f"scale{i}_layer{j}")(x)
                feats.append(x)
            return feats

    t = TorchMultiD()
    params = convert_multiscale_discriminator(t.state_dict(), num_D, n_layers)
    m = MultiscaleDiscriminator(ndf=ndf, n_layers=n_layers, num_D=num_D)
    x = rng.normal(size=(1, 32, 32, 6)).astype(np.float32)
    results = m.apply({"params": params}, jnp.asarray(x))
    # our scale ordering: result[i] uses discriminator num_D-1-i on the
    # i-times-downsampled input (networks.py:404-419)
    golden_full = t.forward_scale(num_D - 1, to_nchw(x))
    for ours_f, gold_f in zip(results[0], golden_full):
        np.testing.assert_allclose(
            np.asarray(ours_f), np.asarray(from_nchw(gold_f)), atol=1e-4
        )
