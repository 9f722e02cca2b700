"""Golden-value parity tests against torch (CPU) for every geometric trap
called out in SURVEY.md §7: torch-style conv padding, ConvTranspose2d
geometry+values, InstanceNorm2d, count_include_pad=False avg pooling, resnet
blocks, the PatchGAN, and the full GlobalGenerator chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from jpdse_tpu.models.discriminator import NLayerDiscriminator
from jpdse_tpu.models.generator import GlobalGenerator
from jpdse_tpu.models.layers import (
    Conv,
    ConvTranspose,
    ResnetBlock,
    avg_pool_3s2,
    instance_norm,
)

torch.manual_seed(0)


def to_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def from_nchw(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def conv_w_to_torch(kernel):  # HWIO -> OIHW
    return torch.from_numpy(np.asarray(kernel).transpose(3, 2, 0, 1))


def convT_w_to_torch(kernel):  # (kh,kw,in,out) -> (in,out,kh,kw)
    return torch.from_numpy(np.asarray(kernel).transpose(2, 3, 0, 1))


@pytest.mark.parametrize("stride,pad,k", [(1, 0, 1), (1, 1, 3), (2, 1, 3), (1, 0, 7), (2, 2, 4), (1, 2, 4)])
def test_conv_matches_torch(rng, stride, pad, k):
    x = rng.normal(size=(2, 12, 16, 5)).astype(np.float32)
    m = Conv(features=7, kernel_size=k, stride=stride, padding=pad)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(v, jnp.asarray(x))
    tconv = tnn.Conv2d(5, 7, k, stride, pad)
    tconv.weight.data = conv_w_to_torch(v["params"]["conv"]["kernel"])
    tconv.bias.data = torch.from_numpy(np.asarray(v["params"]["conv"]["bias"]))
    golden = from_nchw(tconv(to_nchw(x)))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)


def test_grouped_conv_matches_torch(rng):
    x = rng.normal(size=(1, 8, 8, 6)).astype(np.float32)
    m = Conv(features=12, kernel_size=3, padding=1, groups=3)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(v, jnp.asarray(x))
    tconv = tnn.Conv2d(6, 12, 3, 1, 1, groups=3)
    tconv.weight.data = conv_w_to_torch(v["params"]["conv"]["kernel"])
    tconv.bias.data = torch.from_numpy(np.asarray(v["params"]["conv"]["bias"]))
    golden = from_nchw(tconv(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)


@pytest.mark.parametrize("in_hw", [(8, 12), (7, 9)])
def test_conv_transpose_matches_torch(rng, in_hw):
    """ConvTranspose2d(k=3, s=2, p=1, op=1): out = 2*in exactly."""
    h, w = in_hw
    x = rng.normal(size=(2, h, w, 4)).astype(np.float32)
    m = ConvTranspose(features=6, kernel_size=3, stride=2, padding=1, output_padding=1)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(v, jnp.asarray(x))
    assert ours.shape == (2, 2 * h, 2 * w, 6)
    tconv = tnn.ConvTranspose2d(4, 6, 3, 2, 1, output_padding=1)
    tconv.weight.data = convT_w_to_torch(v["params"]["kernel"])
    tconv.bias.data = torch.from_numpy(np.asarray(v["params"]["bias"]))
    golden = from_nchw(tconv(to_nchw(x)))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.normal(size=(3, 9, 11, 8)).astype(np.float32) * 4 + 2
    ours = instance_norm(jnp.asarray(x))
    golden = from_nchw(tnn.InstanceNorm2d(8, affine=False)(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)


def test_avg_pool_matches_torch(rng):
    x = rng.normal(size=(2, 10, 14, 3)).astype(np.float32)
    ours = avg_pool_3s2(jnp.asarray(x))
    golden = from_nchw(
        tnn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)(to_nchw(x))
    )
    assert ours.shape == golden.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)


class TorchResnetBlock(tnn.Module):
    """Reference-spec residual block (networks.py:266-305) built from standard
    torch modules as the golden implementation."""

    def __init__(self, dim):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(1),
            tnn.Conv2d(dim, dim, 3),
            tnn.InstanceNorm2d(dim, affine=False),
            tnn.ReLU(True),
            tnn.ReflectionPad2d(1),
            tnn.Conv2d(dim, dim, 3),
            tnn.InstanceNorm2d(dim, affine=False),
        )

    def forward(self, x):
        return x + self.conv_block(x)


def test_resnet_block_matches_torch(rng):
    x = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    m = ResnetBlock(dim=16)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(v, jnp.asarray(x))
    t = TorchResnetBlock(16)
    t.conv_block[1].weight.data = conv_w_to_torch(v["params"]["conv1"]["conv"]["kernel"])
    t.conv_block[1].bias.data = torch.from_numpy(np.asarray(v["params"]["conv1"]["conv"]["bias"]))
    t.conv_block[5].weight.data = conv_w_to_torch(v["params"]["conv2"]["conv"]["kernel"])
    t.conv_block[5].bias.data = torch.from_numpy(np.asarray(v["params"]["conv2"]["conv"]["bias"]))
    golden = from_nchw(t(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)


def build_torch_global_generator(input_nc, output_nc, ngf, n_down, n_blocks):
    """Golden GlobalGenerator per spec (networks.py:198-247)."""
    layers = [
        tnn.ReflectionPad2d(3),
        tnn.Conv2d(input_nc, ngf, 7),
        tnn.InstanceNorm2d(ngf, affine=False),
        tnn.ReLU(True),
    ]
    for i in range(n_down):
        m = 2**i
        layers += [
            tnn.Conv2d(ngf * m, ngf * m * 2, 3, 2, 1),
            tnn.InstanceNorm2d(ngf * m * 2, affine=False),
            tnn.ReLU(True),
        ]
    m = 2**n_down
    for _ in range(n_blocks):
        layers.append(TorchResnetBlock(ngf * m))
    for i in range(n_down):
        m = 2 ** (n_down - i)
        layers += [
            tnn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, 2, 1, output_padding=1),
            tnn.InstanceNorm2d(ngf * m // 2, affine=False),
            tnn.ReLU(True),
        ]
    layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, output_nc, 7), tnn.Tanh()]
    return tnn.Sequential(*layers)


def test_global_generator_matches_torch(rng):
    """End-to-end geometric + numeric parity for the full generator trunk."""
    ngf, n_down, n_blocks = 8, 2, 2
    x = rng.normal(size=(1, 32, 64, 5)).astype(np.float32)
    m = GlobalGenerator(
        input_nc=5, output_nc=3, ngf=ngf, n_downsampling=n_down, n_blocks=n_blocks
    )
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(v, jnp.asarray(x))
    assert ours.shape == (1, 32, 64, 3)

    t = build_torch_global_generator(5, 3, ngf, n_down, n_blocks)
    p = v["params"]

    def set_conv(tmod, fp):
        tmod.weight.data = conv_w_to_torch(fp["kernel"])
        tmod.bias.data = torch.from_numpy(np.asarray(fp["bias"]))

    set_conv(t[1], p["head"]["conv"]["conv"])
    li = 4
    for i in range(n_down):
        set_conv(t[li], p[f"down{i}"]["conv"]["conv"])
        li += 3
    for i in range(n_blocks):
        set_conv(t[li].conv_block[1], p[f"res{i}"]["conv1"]["conv"])
        set_conv(t[li].conv_block[5], p[f"res{i}"]["conv2"]["conv"])
        li += 1
    for i in range(n_down):
        t[li].weight.data = convT_w_to_torch(p[f"up{i}"]["deconv"]["kernel"])
        t[li].bias.data = torch.from_numpy(np.asarray(p[f"up{i}"]["deconv"]["bias"]))
        li += 3
    set_conv(t[li + 1], p["tail"]["conv"])

    golden = from_nchw(t(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-4)


class TorchNLayerD(tnn.Module):
    """Golden PatchGAN (networks.py:422-471)."""

    def __init__(self, input_nc, ndf=64, n_layers=3):
        super().__init__()
        kw, padw = 4, 2
        seq = [[tnn.Conv2d(input_nc, ndf, kw, 2, padw), tnn.LeakyReLU(0.2, True)]]
        nf = ndf
        for _ in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            seq += [[
                tnn.Conv2d(nf_prev, nf, kw, 2, padw),
                tnn.InstanceNorm2d(nf, affine=False),
                tnn.LeakyReLU(0.2, True),
            ]]
        nf_prev, nf = nf, min(nf * 2, 512)
        seq += [[
            tnn.Conv2d(nf_prev, nf, kw, 1, padw),
            tnn.InstanceNorm2d(nf, affine=False),
            tnn.LeakyReLU(0.2, True),
        ]]
        seq += [[tnn.Conv2d(nf, 1, kw, 1, padw)]]
        self.blocks = tnn.ModuleList([tnn.Sequential(*s) for s in seq])

    def forward(self, x):
        feats = []
        for b in self.blocks:
            x = b(x)
            feats.append(x)
        return feats


def test_nlayer_discriminator_matches_torch(rng):
    ndf, n_layers = 8, 3
    x = rng.normal(size=(1, 32, 32, 6)).astype(np.float32)
    m = NLayerDiscriminator(ndf=ndf, n_layers=n_layers)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    feats = m.apply(v, jnp.asarray(x))
    assert len(feats) == n_layers + 2

    t = TorchNLayerD(6, ndf, n_layers)
    p = v["params"]
    convs = [t.blocks[i][0] for i in range(n_layers + 2)]
    names = [f"layer{i}" for i in range(n_layers + 1)] + ["pred"]
    for tc, nm in zip(convs, names):
        tc.weight.data = conv_w_to_torch(p[nm]["conv"]["kernel"])
        tc.bias.data = torch.from_numpy(np.asarray(p[nm]["conv"]["bias"]))
    golden = t(to_nchw(x))
    for ours_f, gold_f in zip(feats, golden):
        np.testing.assert_allclose(
            np.asarray(ours_f), np.asarray(from_nchw(gold_f)), atol=1e-4
        )


def test_batchnorm_matches_torch(rng):
    """--norm batch parity: gamma init normal(1.0, 0.02) (networks.py:22-24)
    and train/eval forward parity against torch BatchNorm2d."""
    from jpdse_tpu.models.layers import Norm

    x = rng.normal(size=(4, 8, 8, 32)).astype(np.float32) * 3 + 1
    m = Norm(kind="batch")
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    bn_params = v["params"]["BatchNorm_0"]
    g = np.asarray(bn_params["scale"])
    b = np.asarray(bn_params["bias"])
    # init distribution: mean 1.0, std 0.02 (reference weights_init)
    assert abs(g.mean() - 1.0) < 0.02
    assert 0.005 < g.std() < 0.05
    assert np.all(b == 0)

    t = tnn.BatchNorm2d(32, eps=1e-5, momentum=0.1)
    t.weight.data = torch.from_numpy(g)
    t.bias.data = torch.from_numpy(b)

    # train mode: batch statistics
    ours, updates = m.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    t.train()
    golden = from_nchw(t(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-4)

    # eval mode: running statistics (synced from the flax side)
    bs = updates["batch_stats"]["BatchNorm_0"]
    t.running_mean.data = torch.from_numpy(np.asarray(bs["mean"]))
    t.running_var.data = torch.from_numpy(np.asarray(bs["var"]))
    v2 = {"params": v["params"], "batch_stats": updates["batch_stats"]}
    ours_eval = m.apply(v2, jnp.asarray(x), train=False)
    t.eval()
    golden_eval = from_nchw(t(to_nchw(x)))
    np.testing.assert_allclose(
        np.asarray(ours_eval), np.asarray(golden_eval), atol=1e-4
    )


@pytest.mark.parametrize("in_hw", [(8, 12), (7, 9)])
def test_conv_transpose_phase_decomposed_matches_torch(rng, in_hw):
    """Phase-decomposed ConvTranspose (4 dense convs + depth-to-space) is
    exact vs torch ConvTranspose2d(3, 2, 1, output_padding=1)."""
    from jpdse_tpu.models.layers import ConvTranspose

    h, w = in_hw
    x = rng.normal(size=(2, h, w, 4)).astype(np.float32)
    m = ConvTranspose(features=6, phase_decomposed=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(v, jnp.asarray(x))
    assert ours.shape == (2, 2 * h, 2 * w, 6)
    tconv = tnn.ConvTranspose2d(4, 6, 3, 2, 1, output_padding=1)
    tconv.weight.data = convT_w_to_torch(v["params"]["kernel"])
    tconv.bias.data = torch.from_numpy(np.asarray(v["params"]["bias"]))
    golden = from_nchw(tconv(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)

    # and bit-consistent with the dilated implementation
    dil = ConvTranspose(features=6).apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(dil), atol=1e-5)
