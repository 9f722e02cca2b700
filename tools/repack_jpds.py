#!/usr/bin/env python
"""Losslessly re-pack .jpds streams with the current entropy coder and
report old vs new rates — used to quantify the round-4 spatial-context
coder (codec_io VERSION3: per (channel, left-bit, up-bit) adaptive models,
native/range_coder.cpp jpdse_rc_encode_spatial) on the round-3 trained
deploy streams without retraining anything.

The re-pack is bit-lossless: codes and side info decode identically from
the new file (verified per stream here). --write replaces the files (and
updates compress_summary.json totals when present); default is report-only.

Usage:
  python tools/repack_jpds.py artifacts/flagship_r3/bits_phase3 [...dirs] [--write]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jpdse_tpu import codec_io


def repack_dir(d: str, write: bool) -> dict:
    files = sorted(glob.glob(os.path.join(d, "*.jpds")))
    old_total = new_total = npx = 0
    for f in files:
        data = open(f, "rb").read()
        bs = codec_io.unpack_full(data)
        new = codec_io.pack(
            [c[0] for c in bs.codes], bs.image_hw,
            bs.side if not bs.side.empty() else None,
        )
        bs2 = codec_io.unpack_full(new)
        for a, b in zip(bs.codes, bs2.codes):
            assert np.array_equal(a, b), f"code mismatch re-packing {f}"
        for k in ("label", "instance"):
            a, b = getattr(bs.side, k), getattr(bs2.side, k)
            assert (a is None) == (b is None)
            if a is not None:
                assert np.array_equal(a, b), f"{k} mismatch re-packing {f}"
        assert bs.side.base_payloads == bs2.side.base_payloads
        old_total += len(data)
        new_total += len(new)
        npx += bs.image_hw[0] * bs.image_hw[1]
        if write and len(new) < len(data):
            with open(f, "wb") as fh:
                fh.write(new)
    row = {
        "dir": d,
        "files": len(files),
        "old_bytes": old_total,
        "new_bytes": new_total,
        "old_bpp": old_total * 8.0 / npx if npx else 0.0,
        "new_bpp": new_total * 8.0 / npx if npx else 0.0,
    }
    summary = os.path.join(d, "compress_summary.json")
    if write and os.path.exists(summary):
        s = json.load(open(summary))
        if "avg_bpp" in s:
            s["avg_bpp"] = row["new_bpp"]
        if "total_bytes" in s:
            s["total_bytes"] = row["new_bytes"]
        with open(summary, "w") as fh:
            json.dump(s, fh, indent=2)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    for d in args.dirs:
        r = repack_dir(d, args.write)
        print(
            f"{r['dir']}: {r['files']} files  {r['old_bytes']} -> "
            f"{r['new_bytes']} bytes  ({r['old_bpp']:.4f} -> "
            f"{r['new_bpp']:.4f} bpp, ratio {r['new_bytes']/max(r['old_bytes'],1):.4f})"
        )


if __name__ == "__main__":
    main()
