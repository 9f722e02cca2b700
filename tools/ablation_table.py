#!/usr/bin/env python
"""Assemble the round-4 semantics-ablation table (VERDICT missing #1): the
matched-rate A/B between the trained compressed-visuals flagships (raw
one-hot semantics + base codec, round 3) and the no-semantics runs that
re-spend the semantics rate on base-codec quality (round 4,
tools/run_flagship_nosem.sh). Emits the markdown table for BASELINE.md
plus a JSON record.

Usage: python tools/ablation_table.py [--out artifacts/r4_ablation.json]
"""

import argparse
import json
import os
import sys

PAIRS = [
    # (label, A-side eval dir (sem), A-side total bpp, B-side eval dir (no sem), B bpp)
    (
        "q10 point (0.126 bpp)",
        "artifacts/flagship_r3_compressed_q10/eval_phaseB",
        0.1262,
        "artifacts/flagship_r4_nosem_q20/eval_phaseB",
        0.1236,
    ),
    (
        "q10 point, phase A",
        "artifacts/flagship_r3_compressed_q10/eval_phaseA",
        0.1262,
        "artifacts/flagship_r4_nosem_q20/eval_phaseA",
        0.1236,
    ),
    (
        "q15 point (0.157 bpp)",
        "artifacts/flagship_r3_compressed_q15/eval_phaseB",
        0.1568,
        "artifacts/flagship_r4_nosem_q23/eval_phaseB",
        0.1583,
    ),
    (
        "q15 point, phase A",
        "artifacts/flagship_r3_compressed_q15/eval_phaseA",
        0.1568,
        "artifacts/flagship_r4_nosem_q23/eval_phaseA",
        0.1583,
    ),
    # fallback B-side for the q15 point until the per-q retrain lands: the
    # q20-trained no-sem decoder FED q23 payloads (the round-3 swap matrix
    # showed PSNR transfers cross-q essentially for free; MS-SSIM is what
    # per-q training buys, so this UNDERSTATES the no-sem arm)
    (
        "q15 point (no-sem decoder fed q23, no retrain)",
        "artifacts/flagship_r3_compressed_q15/eval_phaseB",
        0.1568,
        "artifacts/flagship_r4_nosem_q20/eval_phaseB_xq23",
        0.1594,
    ),
    # round-5 closers (VERDICT ask #5): architecture-symmetric B-side via
    # the reference's own zero_sem static zeroing (every leaf warm-restored,
    # no re-init asymmetry) at the q10 point's budget
    (
        "q10 point, zero_sem (symmetric arch)",
        "artifacts/flagship_r3_compressed_q10/eval_phaseB",
        0.1262,
        "artifacts/r5_zerosem_q20/eval_phaseB",
        0.1236,
    ),
    (
        "q10 point, zero_sem, phase A",
        "artifacts/flagship_r3_compressed_q10/eval_phaseA",
        0.1262,
        "artifacts/r5_zerosem_q20/eval_phaseA",
        0.1236,
    ),
    # round-5 cheap-semantics arm (VERDICT ask #6): sem_downsample=2 @ q15
    # (0.0964 base + 0.0274 sem = 0.1238 total) vs the same matched-rate
    # rows — here the "A" side is the CHEAP-semantics arm, answering "do
    # semantics pay at half price?"
    (
        "q10 point, sem/2 @q15 (cheap semantics)",
        "artifacts/r5_semdown_f2_q15/eval_phaseB",
        0.1238,
        "artifacts/flagship_r4_nosem_q20/eval_phaseB",
        0.1244,
    ),
    (
        "q10 point, sem/2 @q15, phase A",
        "artifacts/r5_semdown_f2_q15/eval_phaseA",
        0.1238,
        "artifacts/flagship_r4_nosem_q20/eval_phaseA",
        0.1244,
    ),
]


def load(d):
    p = os.path.join(d, "metrics.json")
    if not os.path.exists(p):
        return None
    return json.load(open(p))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/r4_ablation.json")
    args = ap.parse_args()

    rows = []
    print(
        "| operating point | arm | total bpp | PSNR (dB) | MS-SSIM | dPSNR (sem-nosem) | dMS-SSIM |"
    )
    print("|---|---|---|---|---|---|---|")
    for label, a_dir, a_bpp, b_dir, b_bpp in PAIRS:
        a, b = load(a_dir), load(b_dir)
        if a is None or b is None:
            print(f"| {label} | (missing: {a_dir if a is None else b_dir}) | | | | | |")
            continue
        dpsnr = a["PSNR"] - b["PSNR"]
        dms = a["MS-SSIM"] - b["MS-SSIM"]
        print(
            f"| {label} | semantics (A) | {a_bpp:.4f} | {a['PSNR']:.2f} | "
            f"{a['MS-SSIM']:.4f} | {dpsnr:+.2f} | {dms:+.4f} |"
        )
        print(
            f"| {label} | no semantics, matched rate (B) | {b_bpp:.4f} | "
            f"{b['PSNR']:.2f} | {b['MS-SSIM']:.4f} | | |"
        )
        rows.append(
            {
                "point": label,
                "sem": {"bpp": a_bpp, "psnr": a["PSNR"], "msssim": a["MS-SSIM"]},
                "nosem": {"bpp": b_bpp, "psnr": b["PSNR"], "msssim": b["MS-SSIM"]},
                "delta_psnr": dpsnr,
                "delta_msssim": dms,
            }
        )
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"\nwrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
