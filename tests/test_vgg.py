"""VGG19 perceptual-feature parity (networks.py:474-504).

torchvision is not installed here, so the golden model is a torch
nn.Sequential built to torchvision vgg19().features' exact layout
(conv indices 0,2, 5,7, 10,12,14,16, 19,21,23,25, 28,30,32,34 with ReLU
after each conv and MaxPool2d(2) between stages). `convert_torch_vgg19` is
then validated end-to-end: state_dict -> .npz -> flax params -> the same
five relu{k}_1 slice activations the reference takes (networks.py:483-492).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from jpdse_tpu.models.vgg import (
    Vgg19Features,
    convert_torch_vgg19,
    init_vgg19,
    load_vgg19_params,
)

# torchvision vgg19 cfg "E"
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# features indices whose output is relu{k}_1 (slice ends, networks.py:483-492)
_SLICE_END_IDX = (1, 6, 11, 20, 29)


def build_torchvision_vgg19_features():
    layers = []
    in_ch = 3
    for v in _VGG19_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU(inplace=False)]
            in_ch = v
    return tnn.Sequential(*layers)


def test_torchvision_layout_conv_indices():
    """The converter's index arithmetic matches torchvision's layout."""
    feats = build_torchvision_vgg19_features()
    conv_idx = [i for i, m in enumerate(feats) if isinstance(m, tnn.Conv2d)]
    assert conv_idx == [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]


def test_vgg19_conversion_slice_parity(tmp_path):
    torch.manual_seed(0)
    feats = build_torchvision_vgg19_features().eval()
    sd = {k: v.numpy() for k, v in feats.state_dict().items()}

    out = tmp_path / "vgg19_features.npz"
    convert_torch_vgg19(sd, str(out))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 32, 64, 3)).astype(np.float32)

    model = Vgg19Features()
    variables = load_vgg19_params(str(out))
    ours = model.apply(variables, jnp.asarray(x))
    assert len(ours) == 5

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        goldens = []
        for i, m in enumerate(feats):
            t = m(t)
            if i in _SLICE_END_IDX:
                goldens.append(t.numpy().transpose(0, 2, 3, 1))
    for k, (o, g) in enumerate(zip(ours, goldens)):
        np.testing.assert_allclose(
            np.asarray(o), g, atol=2e-4,
            err_msg=f"slice {k + 1} (relu{k + 1}_1) mismatch",
        )


def test_init_vgg19_weights_path(tmp_path):
    """loss.vgg_weights_path round trip through init_vgg19."""
    torch.manual_seed(1)
    feats = build_torchvision_vgg19_features()
    sd = {k: v.numpy() for k, v in feats.state_dict().items()}
    out = tmp_path / "w.npz"
    convert_torch_vgg19(sd, str(out))
    model, variables = init_vgg19(0, str(out))
    got = np.asarray(variables["params"]["conv1_1"]["kernel"])
    want = sd["0.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


def test_vgg_loss_chunked_matches_full():
    """vgg_loss_chunked == vgg_loss in value AND gradient (it is the same
    math, just evaluated chunk-at-a-time under lax.map)."""
    import jax

    from jpdse_tpu.train.losses import vgg_loss, vgg_loss_chunked

    model, variables = init_vgg19(0, None)
    vgg_apply = lambda x: model.apply(variables, x)  # noqa: E731

    rng = np.random.default_rng(3)
    fake = jnp.asarray(rng.normal(size=(4, 16, 32, 3)).astype(np.float32))
    real = jnp.asarray(rng.normal(size=(4, 16, 32, 3)).astype(np.float32))

    full = vgg_loss(vgg_apply, fake, real)
    for chunk in (1, 2, 3, 4):  # 3 clamps to the divisor 2
        got = vgg_loss_chunked(vgg_apply, fake, real, chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full), rtol=2e-6)

    g_full = jax.grad(lambda f: vgg_loss(vgg_apply, f, real))(fake)
    g_chunk = jax.grad(lambda f: vgg_loss_chunked(vgg_apply, f, real, 1))(fake)
    np.testing.assert_allclose(
        np.asarray(g_chunk), np.asarray(g_full), rtol=1e-4, atol=1e-7
    )
