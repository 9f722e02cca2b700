#!/usr/bin/env python
"""Assemble the perceptual-loss A/B summary (round-4 VERDICT missing #1 /
round-5 top ask): three internally-paired arms of the q15 compressed-visuals
flagship — random-init VGG (the round-3 default), no VGG, and the
in-environment seg-trained VGG (tools/train_seg_vgg.py) — same warm start,
seed, split, epochs; only the perceptual term differs. Reference match:
networks.py:474-504 (VGGLoss; pretrained torchvision VGG19 at :477 is
unfetchable here — zero egress).

Usage: python tools/perceptual_ab_table.py [--dir artifacts/r4_perceptual_ab]
Writes <dir>/SUMMARY.md and prints the table.
"""

import argparse
import json
import os

ARMS = [
    ("vgg_rand", "random-init VGG19 (round-3/4 default)"),
    ("no_vgg", "no VGG term (feat-match is the only perceptual loss)"),
    ("vgg_seg", "seg-trained VGG19 (artifacts/seg_vgg, 58.8% held-out acc)"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="artifacts/r4_perceptual_ab")
    args = ap.parse_args()

    rows = []
    for arm, desc in ARMS:
        p = os.path.join(args.dir, f"eval_{arm}", "metrics.json")
        if not os.path.exists(p):
            rows.append((arm, desc, None))
            continue
        rows.append((arm, desc, json.load(open(p))))

    lines = [
        "# Perceptual-loss A/B (round 5): what should the VGG term optimize?",
        "",
        "Three arms of the q15 compressed-visuals flagship, warm-started from",
        "the trained q30 checkpoint (`artifacts/flagship_r3_compressed_long/",
        "phaseB`), 100 full-objective epochs each, seed 1234, same 22/8 split;",
        "only the perceptual term differs (`tools/run_perceptual_ab.sh`).",
        "Reference: networks.py:474-504 (VGGLoss). Held-out 8 at 1024x512.",
        "",
        "| arm | perceptual term | total bpp | PSNR (dB) | MS-SSIM | L1 |",
        "|---|---|---|---|---|---|",
    ]
    for arm, desc, m in rows:
        if m is None:
            lines.append(f"| {arm} | {desc} | (missing) | | | |")
            continue
        lines.append(
            f"| {arm} | {desc} | {m['total_bpp']:.4f} | {m['PSNR']:.2f} | "
            f"{m['MS-SSIM']:.4f} | {m['L1']:.2f} |"
        )
    out = "\n".join(lines) + "\n"
    print(out)
    with open(os.path.join(args.dir, "SUMMARY.md"), "w") as f:
        f.write(out)
    print(f"wrote {os.path.join(args.dir, 'SUMMARY.md')}")


if __name__ == "__main__":
    main()
