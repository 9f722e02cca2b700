#!/usr/bin/env python
"""Base-codec-alone R-D on a Cityscapes-style split: what the in-process
HEVC-intra codec (or jpg/webp/...) achieves by itself on the same held-out
images the learned codec is evaluated on — the comparison line the round-2
VERDICT asked for ("report ... against the HEVC-intra base codec alone at
matched bpp").

Protocol matches the framework eval (reference test.py:114-125): fixed
1024x512 resize, metrics on uint8 images, rate = real bitstream bytes /
pixels.

Usage:
  python tools/base_codec_rd.py --root datasets/cityscapes_split --mode val \
      --ext heif --qualities 20,30,40,50,60,70 --out base_codec_rd.json
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/cityscapes_split")
    ap.add_argument("--mode", default="val")
    ap.add_argument("--ext", default="heif")
    ap.add_argument("--qualities", default="20,30,40,50,60,70")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--out", default="base_codec_rd.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from jpdse_tpu.codecs.bridge import encode_decode
    from jpdse_tpu.ops.metrics import ms_ssim, psnr

    paths = sorted(
        glob.glob(os.path.join(args.root, "leftImg8bit", args.mode, "*", "*.png"))
    )
    if not paths:
        raise SystemExit(f"no images under {args.root}/leftImg8bit/{args.mode}")
    print(f"{len(paths)} images, ext={args.ext}")

    rows = []
    for q in [int(x) for x in args.qualities.split(",")]:
        tot = {"bpp": 0.0, "psnr": 0.0, "msssim": 0.0, "l1": 0.0}
        for p in paths:
            img = Image.open(p).convert("RGB").resize(
                (args.width, args.height), Image.BICUBIC
            )
            dec, nbytes = encode_decode(img, args.ext, q)
            a = np.asarray(img, np.float32)
            b = np.asarray(dec, np.float32)
            tot["bpp"] += nbytes * 8.0 / (args.width * args.height)
            tot["psnr"] += float(psnr(jnp.asarray(a[None]), jnp.asarray(b[None])))
            tot["msssim"] += float(
                ms_ssim(jnp.asarray(a[None]), jnp.asarray(b[None]))
            )
            tot["l1"] += float(np.mean(np.abs(a - b)))
        n = len(paths)
        row = {"ext": args.ext, "quality": q, **{k: v / n for k, v in tot.items()}}
        rows.append(row)
        print(
            f"q={q}: bpp {row['bpp']:.4f}, PSNR {row['psnr']:.2f} dB, "
            f"MS-SSIM {row['msssim']:.4f}, L1 {row['l1']:.2f}"
        )

    with open(args.out, "w") as f:
        json.dump({"images": len(paths), "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
