#!/usr/bin/env python
"""Per-semantic-class distortion of a trained checkpoint on the held-out
split — the reference's get_sem_wise_distortion diagnostic
(pix2pixHD_model.py:646-706; built in ops/semantics.sem_wise_distortion,
never before run on a trained model). The round-4 semantics ablation uses
it to ask WHERE the semantics rate goes: if the one-hot map + edge channel
buy anything, it should show up class-wise (boundaries, thin structures,
rare classes), not just in global PSNR.

Works for any config (the label map is used only for analysis, so the
no-semantics B-side evaluates identically). L1 is on denormalized uint8
pixels, pixel-count-weighted across the whole split.

Usage:
  python tools/sem_wise_eval.py --opt_file RUN/opt.json \
      --checkpoints_dir RUN --root_dir datasets/cityscapes_split \
      --mode val --out RUN/sem_wise.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np

CITYSCAPES_NAMES = [
    "unlabeled", "ego vehicle", "rectification border", "out of roi",
    "static", "dynamic", "ground", "road", "sidewalk", "parking",
    "rail track", "building", "wall", "fence", "guard rail", "bridge",
    "tunnel", "pole", "polegroup", "traffic light", "traffic sign",
    "vegetation", "terrain", "sky", "person", "rider", "car", "truck",
    "bus", "caravan", "trailer", "train", "motorcycle", "bicycle",
    "license plate",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt_file", required=True)
    ap.add_argument("--checkpoints_dir", required=True)
    ap.add_argument("--root_dir", default="datasets/cityscapes_split")
    ap.add_argument("--mode", default="val")
    ap.add_argument("--out", default=None)
    ap.add_argument("--quality", type=int, default=None,
                    help="override the base-codec quality (cross-q eval: "
                         "e.g. the q30-trained semantics decoder fed q10 "
                         "payloads, the round-3 swap-matrix protocol)")
    args = ap.parse_args()

    from jpdse_tpu.config import Config, derive_eval_config
    from jpdse_tpu.data import create_dataloader
    from jpdse_tpu.ops.metrics import denormalize_to_uint8
    from jpdse_tpu.trainer import Trainer

    import jax.numpy as jnp

    cfg = Config.load(args.opt_file)
    cfg.checkpoints_dir = args.checkpoints_dir
    cfg.data.root_dir = args.root_dir
    cfg.save_dir = ""
    if args.quality is not None:
        cfg.codec.quality = (args.quality,)
    cfg = derive_eval_config(cfg, mode="val" if args.mode == "val" else "test")
    cfg.mode = args.mode
    # the LOADER must supply label maps even for no-semantics models (the
    # analysis needs them); the trainer keeps the as-trained architecture
    import copy as _copy

    loader_cfg = _copy.deepcopy(cfg)
    loader_cfg.model.no_label = False
    loader_cfg.model.no_instance = False
    loader = create_dataloader(loader_cfg)
    sample = next(iter(loader))
    tr = Trainer(cfg, mode="test", sample_batch=sample)
    tr.load()

    L = cfg.data.semantic_nc
    num = np.zeros(L, np.float64)  # summed per-class |real-fake| (uint8)
    den = np.zeros(L, np.float64)  # per-class pixel counts
    mean = np.asarray(cfg.data.normalize_mean)
    std = np.asarray(cfg.data.normalize_std)
    n_img = 0
    for batch in loader:
        recon = np.asarray(tr.get_img(batch))
        real_u8 = np.asarray(
            denormalize_to_uint8(jnp.asarray(batch["image"]), mean, std)
        ).astype(np.float64)
        fake_u8 = np.asarray(
            denormalize_to_uint8(jnp.asarray(recon), mean, std)
        ).astype(np.float64)
        lab = np.clip(np.asarray(batch["label"]).astype(np.int64), 0, L - 1)
        diff = np.abs(real_u8 - fake_u8).sum(-1)  # (B, H, W)
        num += np.bincount(lab.reshape(-1), weights=diff.reshape(-1), minlength=L)
        den += np.bincount(lab.reshape(-1), minlength=L)
        n_img += recon.shape[0]

    per_class = np.where(den > 0, num / np.maximum(den, 1.0), 0.0)
    total_px = den.sum()
    rows = []
    for i in range(L):
        if den[i] == 0:
            continue
        name = CITYSCAPES_NAMES[i] if i < len(CITYSCAPES_NAMES) else str(i)
        rows.append(
            {
                "class_id": int(i),
                "name": name,
                "l1_uint8": float(per_class[i]),
                "pixel_share": float(den[i] / total_px),
            }
        )
    result = {
        "n_images": n_img,
        "overall_l1_uint8": float(num.sum() / total_px),
        "per_class": rows,
    }
    print(f"{n_img} images; overall per-pixel L1 {result['overall_l1_uint8']:.3f}")
    for r in sorted(rows, key=lambda r: -r["pixel_share"])[:12]:
        print(f"  {r['name']:<20} share {r['pixel_share']:.3f}  L1 {r['l1_uint8']:.2f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
