#!/usr/bin/env python
"""Sub-stage profile of the netE4label fast-path BACK stage (VERDICT r2 #6).

The stage measured 27.5 ms at batch 8 (vs netG's 19.4) and the width
tap-split only bought 0.4 ms. This tool splits the stage into its pieces —
uplast deconv(+IN+relu), the d2s->reflect_pad->s2d grid re-alignment, the
tail conv in each formulation (direct N=144 / width-split N=576 / grouped
N=288 / full 16-tap split N=2304), and the tanh+d2s epilogue — to locate
the time before optimizing. Timing protocol: chained fori_loop, relay-safe
(see tools/bench_fast_stages.timed_loop).

Usage: python tools/bench_e4l_back.py [--batch 8] [--hw 512x1024]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="512x1024")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--only", default=None,
                    help="comma-separated substrings; time only matching stages")
    args = ap.parse_args()
    H, W = (int(v) for v in args.hw.split("x"))
    B = args.batch
    DTYPE = jnp.bfloat16

    import tools.bench_fast_stages as BFS
    from jpdse_tpu.models.fast_codec import _FastTrunk
    from jpdse_tpu.models.generator import Encoder
    from jpdse_tpu.models.layers import reflect_pad
    from jpdse_tpu.ops import s2d as S

    timed_loop = BFS.timed_loop
    in_nc = 36
    rng = np.random.default_rng(0)
    gen = Encoder(in_nc, in_nc, args.ngf, 4, binarize=True,
                  binarizer_out_channels=128, fused=False, dtype=DTYPE)
    x_fine = jnp.asarray(
        rng.normal(size=(B, H, W, in_nc)).astype(np.float32), DTYPE)
    params = gen.init(jax.random.PRNGKey(0), x_fine)["params"]
    fast = _FastTrunk(params, 4, 0, "mid", DTYPE)
    w = dict(fast.weights)

    # all tail weight variants from the raw tail kernel
    wt = np.asarray(params["tail"]["conv"]["kernel"])
    wt_p = S.conv_s1_weights_to_s2d(wt)  # (4, 4, 4*ngf, 144)
    kp = wt_p.shape[0]
    w["tail_direct"] = jnp.asarray(wt_p, DTYPE)
    w["tail_w1"] = jnp.asarray(S.weights_tap_split_w(wt_p, 1), DTYPE)
    w["tail_w2"] = jnp.asarray(S.weights_tap_split_w(wt_p, 2), DTYPE)
    w["tail_full"] = jnp.asarray(S.weights_tap_split(wt_p), DTYPE)
    print(f"tail_split mode in prod: {fast.tail_split}; kp={kp} "
          f"cout4={wt_p.shape[-1]}", flush=True)

    results = {}

    def rec(name, fn, x, weights):
        if args.only and not any(s in name for s in args.only.split(",")):
            return
        sec = timed_loop(fn, weights, x, iters=args.iters)
        results[name] = round(sec * 1000, 3)
        print(f"{name}: {sec * 1000:.3f} ms", flush=True)

    c_last = w["uplast_w"].shape[2]
    h3 = jnp.asarray(
        rng.normal(size=(B, H // 2, W // 2, c_last)).astype(np.float32), DTYPE)

    rec("back_full[prod]", fast.back, h3, w)

    def uplast_in(w_, h):
        hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = S.conv_valid(hp, w_["uplast_w"]) + w_["uplast_b"]
        return jax.nn.relu(S.instance_norm_s2d(y))

    rec("uplast+IN+relu", uplast_in, h3, w)
    y = uplast_in(w, h3)

    def relayout(w_, y):
        return S.space_to_depth(reflect_pad(S.depth_to_space(y), 3))

    rec("d2s+pad+s2d", relayout, y, w)
    rec("realign_fused", lambda w_, t: S.s2d_realign_pad3(t), y, w)
    from jpdse_tpu.ops.pallas.realign import s2d_realign_pad3_pallas
    rec("realign_pallas", lambda w_, t: s2d_realign_pad3_pallas(t), y, w)
    yp = relayout(w, y)

    rec("tail_direct[N=144]",
        lambda w_, x: S.conv_valid(x, w_["tail_direct"]), yp, w)
    rec("tail_wsplit_g1[N=576]",
        lambda w_, x: S.conv_tap_split_w(x, w_["tail_w1"], kp, 1), yp, w)
    rec("tail_wsplit_g2[N=288]",
        lambda w_, x: S.conv_tap_split_w(x, w_["tail_w2"], kp, 2), yp, w)
    rec("tail_full16[N=2304]",
        lambda w_, x: S.conv_tap_split(x, w_["tail_full"], kp, kp), yp, w)

    t = S.conv_valid(yp, w["tail_direct"])

    def tanh_d2s(w_, t):
        return S.depth_to_space(jnp.tanh(t + w_["tail_b"]))

    rec("tanh+d2s", tanh_d2s, t, w)

    # candidate optimized back: fused re-alignment + each tail mode
    def back_opt(tail, how="xla1"):
        def go(w_, h):
            hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            yy = S.conv_valid(hp, w_["uplast_w"]) + w_["uplast_b"]
            yy = jax.nn.relu(S.instance_norm_s2d(yy))
            ypp = (s2d_realign_pad3_pallas(yy) if how == "pallas"
                   else S.s2d_realign_pad3(yy))
            if tail == "direct":
                tt = S.conv_valid(ypp, w_["tail_direct"])
            elif tail == "g1":
                tt = S.conv_tap_split_w(ypp, w_["tail_w1"], kp, 1)
            else:
                tt = S.conv_tap_split_w(ypp, w_["tail_w2"], kp, 2)
            return S.depth_to_space(jnp.tanh(tt + w_["tail_b"]))
        return go

    for mode in ("direct", "g1", "g2"):
        rec(f"back_opt[realign+{mode}]", back_opt(mode), h3, w)
    for mode in ("direct", "g2"):
        rec(f"back_opt[pallas+{mode}]", back_opt(mode, "pallas"), h3, w)

    print(json.dumps({"batch": B, "hw": f"{H}x{W}", "ms": results}))


if __name__ == "__main__":
    main()
