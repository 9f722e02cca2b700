#!/usr/bin/env python
"""Assemble the BASELINE.md 'Trained operating points' table from committed
eval artifacts: for every artifacts/<run>/eval_<phase>/metrics.json, pair it
with the matching bits_<phase>/compress_summary.json (real entropy-coded
.jpds rate, side info included) and print a markdown row.

Usage: python tools/trained_table.py [artifacts_dir...]
Defaults to every artifacts/flagship_r3* run dir.
"""

import glob
import json
import os
import sys


def rows_for(run_dir: str):
    out = []
    for eval_dir in sorted(glob.glob(os.path.join(run_dir, "eval_*"))):
        phase = os.path.basename(eval_dir)[len("eval_") :]
        mpath = os.path.join(eval_dir, "metrics.json")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            m = json.load(f)
        bits = os.path.join(run_dir, f"bits_{phase}", "compress_summary.json")
        coded_bpp = None
        if os.path.exists(bits):
            with open(bits) as f:
                coded_bpp = json.load(f).get("avg_bpp")
        out.append(
            {
                "run": os.path.basename(run_dir),
                "phase": phase,
                "n": m.get("n_images"),
                "coded_bpp": coded_bpp,
                "eval_total_bpp": m.get("total_bpp"),
                "psnr": m.get("PSNR"),
                "msssim": m.get("MS-SSIM"),
            }
        )
    return out


def main():
    dirs = sys.argv[1:] or sorted(glob.glob("artifacts/flagship_r3*"))
    rows = []
    for d in dirs:
        if os.path.isdir(d):
            rows.extend(rows_for(d))
    print("| run / phase (held-out n) | coded bpp (.jpds) | eval bpp | PSNR (dB) | MS-SSIM |")
    print("|---|---|---|---|---|")
    for r in rows:
        bpp = f"{r['coded_bpp']:.3f}" if r["coded_bpp"] is not None else "—"
        ebpp = (
            f"{r['eval_total_bpp']:.3f}" if r["eval_total_bpp"] is not None else "—"
        )
        psnr = f"{r['psnr']:.2f}" if r["psnr"] is not None else "—"
        ms = f"{r['msssim']:.4f}" if r["msssim"] is not None else "—"
        print(
            f"| {r['run']} {r['phase']} (n={r['n']}) | {bpp} | {ebpp} "
            f"| {psnr} | {ms} |"
        )


if __name__ == "__main__":
    main()
