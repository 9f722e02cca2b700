"""VGG19 feature extractor for the perceptual loss (networks.py:473-504).

Returns activations after relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1 —
the same five slices the reference takes from torchvision's pretrained VGG19
(networks.py:483-492).

Pretrained weights: the reference downloads torchvision's; in this framework
weights are loaded from a local ``.npz`` (set ``loss.vgg_weights_path``) —
produced once by ``jpdse_tpu.models.vgg.convert_torch_vgg19`` from a torch
state_dict. Without a weights file the extractor still works with its random
(seeded) init, which keeps the perceptual loss a valid similarity metric for
smoke training, but real runs should supply converted weights.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# (channels, convs-in-stage) per VGG19 stage
_STAGES = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))
# slice boundaries: feature list index after relu{k}_1 for k=1..5
_SLICE_AT = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")


class Vgg19Features(nn.Module):
    """VGG19 trunk through conv5_1, emitting the 5 relu{k}_1 activations."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        outs = []
        for s, (ch, n_convs) in enumerate(_STAGES, start=1):
            for c in range(1, n_convs + 1):
                name = f"conv{s}_{c}"
                x = nn.Conv(
                    ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=name
                )(x)
                x = nn.relu(x)
                if name in _SLICE_AT:
                    outs.append(x)
                if len(outs) == 5:
                    return outs
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outs


def convert_torch_vgg19(state_dict, out_path: str):
    """Convert a torchvision vgg19().features state_dict to our .npz layout.

    torch features indices: conv layers at 0,2, 5,7, 10,12,14,16, 19,21,23,25,
    28,30,32,34 (OIHW) -> HWIO under names conv{stage}_{idx}.
    """
    idx_map = []
    i = 0
    for s, (_, n_convs) in enumerate(_STAGES, start=1):
        for c in range(1, n_convs + 1):
            idx_map.append((i, f"conv{s}_{c}"))
            i += 2  # conv + relu
        i += 1  # maxpool
    arrays = {}
    for torch_idx, name in idx_map:
        w = state_dict[f"{torch_idx}.weight"]
        b = state_dict[f"{torch_idx}.bias"]
        w = np.asarray(w, dtype=np.float32).transpose(2, 3, 1, 0)  # OIHW->HWIO
        arrays[f"{name}.kernel"] = w
        arrays[f"{name}.bias"] = np.asarray(b, dtype=np.float32)
    np.savez(out_path, **arrays)
    return out_path


def load_vgg19_params(path: str) -> dict:
    """Load a converted .npz into a flax params dict for Vgg19Features."""
    data = np.load(path)
    params = {}
    for key in data.files:
        name, kind = key.rsplit(".", 1)
        params.setdefault(name, {})[kind] = jnp.asarray(data[key])
    return {"params": params}


def init_vgg19(rng_seed: int = 0, weights_path: str | None = None):
    """Build (module, variables). Uses converted weights when provided, else a
    deterministic random init (documented fallback for environments without
    the pretrained file)."""
    model = Vgg19Features()
    if weights_path:
        variables = load_vgg19_params(weights_path)
    else:
        variables = model.init(
            jax.random.PRNGKey(rng_seed), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
    return model, variables
