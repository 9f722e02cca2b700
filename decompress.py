#!/usr/bin/env python
"""Deploy-time decoder CLI: .jpds bitstreams -> reconstructed PNGs, using
only the bitstream files + the model checkpoint (no access to the original
images/labels — the true decoder side of the codec).

Example:
  python decompress.py --load_opt --opt_file runs/learned/opt.json \\
    --checkpoints_dir runs/learned --input out/bitstreams \\
    --save_dir out/recon
"""

import argparse
import glob
import os
import sys

from jpdse_tpu.platform import honor_jax_platforms_env, init_distributed

honor_jax_platforms_env()
init_distributed()  # no-op unless a multi-process run is configured

import numpy as np
from PIL import Image

from jpdse_tpu.cli import parse_config
from jpdse_tpu.config import derive_eval_config
from jpdse_tpu.trainer import Trainer
from jpdse_tpu.utils.misc import tensor2im


def main():
    # --input is this CLI's own flag; everything else is the config surface
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--input", required=True, help=".jpds file or directory")
    own, rest = ap.parse_known_args()
    sys.argv = [sys.argv[0]] + rest

    cfg = parse_config(is_train=False)
    cfg = derive_eval_config(cfg, mode="test")
    trainer = Trainer(cfg, mode="test")
    trainer.load()

    paths = (
        sorted(glob.glob(os.path.join(own.input, "*.jpds")))
        if os.path.isdir(own.input)
        else [own.input]
    )
    if not paths:
        raise SystemExit(f"no .jpds files under {own.input}")
    os.makedirs(cfg.save_dir, exist_ok=True)
    for p in paths:
        with open(p, "rb") as f:
            img = trainer.decompress(f.read())
        u8 = tensor2im(img, cfg.data.normalize_mean, cfg.data.normalize_std)
        out = os.path.join(
            cfg.save_dir, os.path.splitext(os.path.basename(p))[0] + ".png"
        )
        Image.fromarray(np.asarray(u8, np.uint8)).save(out)
        print(f"{p} -> {out}")


if __name__ == "__main__":
    main()
