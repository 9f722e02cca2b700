#!/usr/bin/env python
"""Re-nest a trained GlobalGenerator checkpoint for LocalEnhancer warm start.

The reference's high-resolution recipe (pix2pixHD heritage: networks.py
LocalEnhancer + the --niter_fix_global flag, reference
ctu/parsers/base_parser.py knob surface) trains the 1024x512 global
generator first, then wraps it in a local enhancer at 2048x1024 with the
global trunk frozen for the first N epochs. Our LocalEnhancer module nests
the coarse trunk under ``netG/global`` (models/generator.py) and drops the
global tail (networks.py:152-153), so a flat GlobalGenerator checkpoint
(``netG/{head,down*,res*,up*,tail}``) must be re-nested before
train.py --load_model can partial-merge it (train/checkpoint.py
merge_trees: path+shape matching).

This tool loads a trained checkpoint's params, moves ``params_g.netG.*``
(minus ``tail``) to ``params_g.netG.global.*``, drops the discriminator
(the enhancer trains against a fresh D at the new resolution), and writes
a params-only checkpoint directory that ``--load_model`` restores from
(optimizer state intentionally absent -> fresh init, the cross-phase path).

Shape contract: the local model must be configured with ngf = src_ngf / 2
(LocalEnhancer uses ngf_global = ngf * 2^n_local_enhancers), e.g. a trained
--ngf 64 global warm-starts a --netG local --ngf 32 model — the same
pairing the pix2pixHD 2048x1024 recipe uses.

Usage:
  JAX_PLATFORMS=cpu python tools/warmstart_local_from_global.py \
      --src artifacts/flagship_r3_compressed_long/phaseB --dst /tmp/local_init
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="trained checkpoint dir (has params/)")
    ap.add_argument("--dst", required=True, help="output warm-start checkpoint dir")
    ap.add_argument(
        "--keep-tail",
        action="store_true",
        help="keep the global tail weights (dropped by default: the "
        "LocalEnhancer global trunk has no tail)",
    )
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    src = os.path.abspath(os.path.join(args.src, "params"))
    raw = ocp.PyTreeCheckpointer().restore(src)
    params_g = raw["params_g"]
    if "netG" not in params_g:
        raise SystemExit(f"no netG in {src}")
    netg = dict(params_g["netG"])
    if "global" in netg:
        raise SystemExit("source is already a LocalEnhancer checkpoint")
    dropped = []
    if not args.keep_tail and "tail" in netg:
        netg.pop("tail")
        dropped.append("netG/tail")
    new_g = {"netG": {"global": netg}}
    # encoders (netE/netE4label) are resolution-independent: carry them over
    for k in params_g:
        if k != "netG":
            new_g[k] = params_g[k]
    out = {"params_g": new_g}
    dropped.append("params_d (fresh discriminator at the new resolution)")

    dst = os.path.abspath(os.path.join(args.dst, "params"))
    os.makedirs(args.dst, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dst, out, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(args.dst, "trainer_meta.json"), "w") as f:
        json.dump({"epoch": 0, "warmstart_from": args.src}, f)
    n = len([1 for _ in _leaves(out)])
    print(f"wrote {dst}: {n} leaves; moved netG/* -> netG/global/*; "
          f"dropped: {', '.join(dropped)}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
