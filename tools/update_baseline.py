#!/usr/bin/env python
"""Rewrite BASELINE.md's measured R-D table from tools/measure_rd.py outputs.

Usage: python tools/update_baseline.py rd_results_jpg.json [rd_results_webp.json ...]
"""

import json
import re
import sys


def main():
    points = []
    for path in sys.argv[1:]:
        with open(path) as f:
            points.extend(json.load(f)["points"])

    rows = []
    header = (
        "| Codec | Quality | bpp | PSNR jax (dB) | PSNR torch (dB) | dPSNR (dB) "
        "| MS-SSIM jax | MS-SSIM torch | dMS-SSIM | L1 | parity |\n"
        "|---|---|---|---|---|---|---|---|---|---|---|"
    )
    for p in points:
        ok = "OK" if (p["dpsnr"] <= 0.05 and p["dmsssim"] <= 0.001) else "FAIL"
        # honest operating-point label: --ext bpg runs through the
        # in-process HEVC-intra codec (q mapped 100-2q), not bpgenc
        if p["ext"] == "bpg":
            p = dict(p, ext="bpg* (HEVC-intra, q mapped 100-2q)")
        rows.append(
            f"| {p['ext']} | {p['quality']} | {p['bpp']:.4f} | {p['psnr_jax']:.3f} "
            f"| {p['psnr_torch']:.3f} | {p['dpsnr']:.5f} | {p['msssim_jax']:.5f} "
            f"| {p['msssim_torch']:.5f} | {p['dmsssim']:.6f} | {p['l1_jax']:.3f} | {ok} |"
        )
    n = points[0]["n_images"] if points else 0
    table = (
        "## Measured R-D parity table (filled by tools/measure_rd.py)\n\n"
        f"Both stacks (this framework vs the reference architecture rebuilt from\n"
        f"spec in torch, identical imported weights) evaluated with the reference\n"
        f"protocol on the bundled {n}-image Cityscapes val set at 1024x512,\n"
        "phase-2 inference configuration. bpp is the real base-codec bitstream\n"
        "(bytes*8/pixels). The bpg rows run the reference's exact BPG quality\n"
        "factors {33,36,39,42} through the in-process HEVC-intra codec\n"
        "(bpgenc/bpgdec binaries are absent; BPG is HEVC intra, mapped\n"
        "q_heif = 100 - 2*q_bpg - codecs/bridge.py); jpg/webp points use PIL\n"
        "(same protocol, same code path). Parity bar: |dPSNR| <= 0.05 dB and\n"
        "|dMS-SSIM| <= 0.001 per point.\n\n"
        "NOTE on absolute numbers: the weights are seeded reference-init\n"
        "(the published pretrained checkpoints are not fetchable in this\n"
        "zero-egress environment), so absolute PSNR reflects an untrained\n"
        "generator — the table's claim is cross-stack parity at identical\n"
        "weights, measured at full scale. Trained-quality progression is\n"
        "demonstrated separately in artifacts/three_phase/SUMMARY.md\n"
        "(PSNR 21.29 dB / MS-SSIM 0.839 after the reduced-scale 3-phase\n"
        "recipe). bpp is weight-independent and real.\n\n"
        + header + "\n" + "\n".join(rows) + "\n"
    )

    with open("BASELINE.md") as f:
        md = f.read()
    marker = "## Measured R-D parity table"
    if marker in md:
        start = md.index(marker)
        # preserve everything from the NEXT section heading on (the trained
        # operating-points table lives below this one)
        nxt = md.find("\n## ", start + len(marker))
        tail = md[nxt + 1 :] if nxt != -1 else ""
        md = md[:start] + table + ("\n" + tail if tail else "")
    else:
        md = md + "\n" + table
    with open("BASELINE.md", "w") as f:
        f.write(md)
    print(f"BASELINE.md updated with {len(rows)} operating points")


if __name__ == "__main__":
    main()
