#!/usr/bin/env python
"""Stage-level TPU timing of the fast (space-to-depth) codec path vs the
standard path, to locate where the end-to-end 2x loss (12.0 vs 24.3 MP/s,
round 1) comes from: the s2d convs themselves, the s2d/d2s re-layouts, the
instance norms, or the transposed convs.

Each stage is timed with the chained-fori_loop protocol (relay-safe): the
loop body re-derives its input from the previous output through a negligible
`+ 1e-30 * mean(out)` dependency, so iterations serialize without host
round trips; an empty-body control run calibrates that overhead away.

Usage: python tools/bench_fast_stages.py [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp

H, W = 512, 1024
DTYPE = jnp.bfloat16


def timed_loop(fn, w, x, iters=8, reps=3):
    """Time fn(w, x) chained `iters` times; returns seconds per call.
    Weights are a jit ARGUMENT — closure-captured weights get baked into the
    serialized compile payload, which the remote-compile relay rejects
    (HTTP 413) for the 1024-channel res-block stacks."""

    def chained(w, x, n):
        def body(_, carry):
            out = fn(w, carry)
            dep = jnp.mean(out.astype(jnp.float32)) * 1e-30
            return (carry + dep.astype(carry.dtype)).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    j = jax.jit(chained, static_argnums=2)

    def t(n):
        t0 = time.perf_counter()
        out = j(w, x, n)
        float(jnp.sum(out[(0,) * out.ndim]))
        return time.perf_counter() - t0

    n1, n2 = 1, 1 + iters
    t(n1), t(n2)
    t1 = min(t(n1) for _ in range(reps))
    t2 = min(t(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default=None, help="override HxW, e.g. 64x128 (CPU smoke)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=9)
    ap.add_argument("--trunk", default="netG", choices=["netG", "netE", "netE4label"],
                    help="netG: generator trunk (default); netE/netE4label: "
                         "binarized encoder trunks (3 / 36 input channels)")
    ap.add_argument("--fronts-only", action="store_true",
                    help="only measure the front stages (head-conv A/B runs)")
    ap.add_argument("--backs-only", action="store_true",
                    help="only measure the back stages (tail-conv A/B runs)")
    ap.add_argument("--prep-only", action="store_true",
                    help="only measure flagship input assembly "
                         "(prepare_inputs: one-hot + edges + concat)")
    args = ap.parse_args()
    B = args.batch
    global H, W
    if args.hw:
        H, W = (int(v) for v in args.hw.split("x"))

    from jpdse_tpu.config import Config, apply_dataset_defaults
    from jpdse_tpu.models.fast_codec import _FastTrunk
    from jpdse_tpu.models.generator import Encoder, GlobalGenerator
    from jpdse_tpu.ops import s2d as S

    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.model.no_generator_binarization = True
    ngf, nd, nb = args.ngf, 4, args.blocks
    rng = np.random.default_rng(0)

    if args.trunk == "netG":
        in_nc = 39  # phase-2: 35 one-hot + edge + 3 visuals
        # standard generator (fused norm off: isolate layout effects)
        gen = GlobalGenerator(in_nc, 3, ngf, nd, nb, fused=False, dtype=DTYPE)
        bin_mode = "none"
    else:
        in_nc = 3 if args.trunk == "netE" else 36
        gen = Encoder(in_nc, in_nc, ngf, nd, binarize=True,
                      binarizer_out_channels=128, fused=False, dtype=DTYPE)
        bin_mode = "mid"
        nb = 0
    x_fine = jnp.asarray(rng.normal(size=(B, H, W, in_nc)).astype(np.float32), DTYPE)
    params = gen.init(jax.random.PRNGKey(0), x_fine)["params"]

    fast = _FastTrunk(params, nd, nb, bin_mode, DTYPE)
    w = fast.weights
    print(f"trunk={args.trunk} in_nc={in_nc} head_fold={fast.head_fold}", flush=True)

    results = {}

    def rec(name, fn, x, weights=None):
        weights = weights if weights is not None else {}
        sec = timed_loop(fn, weights, x, iters=args.iters)
        results[name] = round(sec * 1000, 3)
        print(f"{name}: {sec * 1000:.3f} ms", flush=True)

    # control: loop overhead on the fine input
    rec("control_fine", lambda w_, x: x, x_fine)

    if args.prep_only:
        # flagship input assembly at full scale: one-hot(35) + edges +
        # concat with the 3-channel visuals, bf16 (fast-path form).
        # Measured 0.57 ms at batch 8 on v5e (vs 125 ms e2e decode) — input
        # assembly is noise; no s2d-direct one-hot rewrite warranted. (The
        # reduce consumer lower-bounds it; a materializing consumer like the
        # real head conv adds at most one ~670MB write ~ 1ms more.)
        # label/inst ride in as jit ARGUMENTS (the `w` dict — no baked
        # constants, relay 413) and the visuals are the LOOP CARRY so the
        # whole assembly depends on the iteration and cannot be hoisted.
        from jpdse_tpu.models.codec import prepare_inputs

        cfg.codec.use_compressed = True
        wd = {
            "label": jnp.asarray(rng.integers(0, 35, (B, H, W)).astype(np.int32)),
            "inst": jnp.asarray(rng.integers(0, 60, (B, H, W)).astype(np.int32)),
        }
        comp = jnp.asarray(
            rng.normal(size=(B, H, W, 3)).astype(np.float32), DTYPE
        )

        def prep(w_, comp):
            # zero-valued but loop-carried dependency so the one-hot/edge
            # work cannot be hoisted out of the timed loop either
            eps = (comp[0, 0, 0, 0].astype(jnp.float32) * 1e-30).astype(jnp.int32)
            inputs = prepare_inputs(
                cfg, w_["label"] + eps, w_["inst"] + eps, comp, comp
            )
            return jnp.concatenate(
                [inputs["input_label"],
                 inputs["compressed_img"].astype(inputs["input_label"].dtype)],
                axis=-1,
            )

        rec("prepare_inputs+concat", prep, comp, wd)
        print(json.dumps({"batch": B, "ms": results}))
        return

    if args.fronts_only:
        # head-conv A/B: folded front (current head_fold mode) vs std front
        rec(f"fast_front[{fast.head_fold}]", fast.front, x_fine, w)
        # s2d-e2e front: input arrives already in the s2d domain
        # (JPDSE_S2D_E2E assembly) and enters via the pad-3 re-alignment
        rec("fast_front_s2d", fast.front_s2d, S.space_to_depth(x_fine), w)

        def std_front(p, x):
            return gen.apply(
                {"params": p}, x,
                method=lambda m, x: m.down[0](m.head(x)),
            )

        rec("std_front(head+down0)", std_front, x_fine, params)
        print(json.dumps({"batch": B, "trunk": args.trunk,
                          "head_fold": fast.head_fold, "ms": results}))
        return

    if args.backs_only:
        # tail-conv A/B: fast back (current tail_split mode) vs std back
        c_last = w["uplast_w"].shape[2]
        h3 = jnp.asarray(
            rng.normal(size=(B, H // 2, W // 2, c_last)).astype(np.float32), DTYPE
        )
        rec(f"fast_back[split={fast.tail_split}]", fast.back, h3, w)

        from jpdse_tpu.models.layers import reflect_pad

        def std_back(p, h):
            def go(m, h):
                h = m.up[nd - 1](h)
                h = reflect_pad(h, 3)
                return jnp.tanh(m.tail(h))

            return gen.apply({"params": p}, h, method=go)

        rec("std_back(uplast+tail)", std_back, h3, params)
        print(json.dumps({"batch": B, "trunk": args.trunk,
                          "tail_split": fast.tail_split, "ms": results}))
        return

    # raw re-layouts
    rec("s2d_fine_input", lambda w_, x: S.space_to_depth(x), x_fine)
    from jpdse_tpu.models.layers import reflect_pad as _rp

    rec("pad3+s2d_fine_input", lambda w_, x: S.space_to_depth(_rp(x, 3)),
        x_fine)
    try:
        from jpdse_tpu.ops.pallas.realign import (
            pallas_realign_supported, s2d_pad3_pallas)

        if pallas_realign_supported():
            rec("pad3+s2d_pallas", lambda w_, x: s2d_pad3_pallas(x), x_fine)
    except Exception as e:  # record, don't abort the sweep
        print(f"pad3+s2d_pallas failed: {e}", flush=True)
    y_s2d256 = jnp.asarray(
        rng.normal(size=(B, H // 2, W // 2, 4 * ngf)).astype(np.float32), DTYPE
    )
    rec("d2s_256ch_halfres", lambda w_, x: S.depth_to_space(x), y_s2d256)
    rec("s2d_64ch_fullres", lambda w_, x: S.space_to_depth(x),
        jnp.asarray(rng.normal(size=(B, H, W, ngf)).astype(np.float32), DTYPE))

    # fast stages (weights as jit args)
    rec("fast_front", fast.front, x_fine, w)
    rec("fast_front_s2d", fast.front_s2d, S.space_to_depth(x_fine), w)
    h1 = fast.front(w, x_fine)
    rec("fast_mid_down", fast.mid_down, h1, w)
    h2 = fast.mid_down(w, h1)
    if bin_mode != "none":
        rec("fast_binarizer", fast.apply_binarizer, h2, w)
        h2 = fast.apply_binarizer(w, h2)
    rec("fast_res_blocks", fast.res_blocks, h2, w)
    rec("fast_mid_up", fast.mid_up, h2, w)
    h3 = fast.mid_up(w, h2)
    rec("fast_back", fast.back, h3, w)
    rec("fast_back_s2d",
        lambda w_, h: fast.back(w_, h, keep_s2d=True), h3, w)

    # standard-path equivalents (head+down0 at full res; last up + tail)

    def std_front(p, x):
        return gen.apply(
            {"params": p}, x,
            method=lambda m, x: m.down[0](m.head(x)),
        )

    rec("std_front(head+down0)", std_front, x_fine, params)

    from jpdse_tpu.models.layers import reflect_pad

    def std_back(p, h):
        def go(m, h):
            h = m.up[nd - 1](h)
            h = reflect_pad(h, 3)
            return jnp.tanh(m.tail(h))

        return gen.apply({"params": p}, h, method=go)

    rec("std_back(uplast+tail)", std_back, h3, params)

    def std_full(p, x):
        return gen.apply({"params": p}, x)

    rec("std_full", std_full, x_fine, params)
    rec("fast_full", fast, x_fine, w)

    print(json.dumps({"batch": B, "ms": results}))


if __name__ == "__main__":
    main()
