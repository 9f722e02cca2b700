#!/usr/bin/env python
"""Convert a torchvision VGG19 checkpoint to the framework's .npz layout.

Run once on a machine with the torchvision file (e.g.
~/.cache/torch/hub/checkpoints/vgg19-dcbb9e9d.pth), then point
``loss.vgg_weights_path`` at the output:

  python scripts/convert_vgg19.py vgg19-dcbb9e9d.pth vgg19_features.npz
"""

import sys

import torch

from jpdse_tpu.models.vgg import convert_torch_vgg19


def main():
    src, dst = sys.argv[1], sys.argv[2]
    sd = torch.load(src, map_location="cpu")
    # accept either a full vgg19 state_dict (features.N.*) or a bare features one
    feats = {}
    for k, v in sd.items():
        if k.startswith("features."):
            feats[k[len("features."):]] = v.numpy()
        elif k[0].isdigit():
            feats[k] = v.numpy()
    convert_torch_vgg19(feats, dst)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
