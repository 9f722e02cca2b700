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
import functools
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


def timed_loop(fn, x, iters=8, reps=3):
    """Time fn(x) chained `iters` times; returns seconds per call."""

    def chained(x, n):
        def body(_, carry):
            out = fn(carry)
            dep = jnp.mean(out.astype(jnp.float32)) * 1e-30
            return (carry + dep.astype(carry.dtype)).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    j = jax.jit(chained, static_argnums=1)

    def t(n):
        t0 = time.perf_counter()
        out = j(x, n)
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
    args = ap.parse_args()
    B = args.batch
    global H, W
    if args.hw:
        H, W = (int(v) for v in args.hw.split("x"))

    from jpdse_tpu.config import Config, apply_dataset_defaults
    from jpdse_tpu.models.fast_codec import _FastTrunk
    from jpdse_tpu.models.generator import GlobalGenerator
    from jpdse_tpu.ops import s2d as S

    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.model.no_generator_binarization = True
    in_nc = 39  # phase-2: 35 one-hot + edge + 3 visuals
    ngf, nd, nb = args.ngf, 4, args.blocks

    # standard generator (fused norm off: isolate layout effects)
    gen = GlobalGenerator(in_nc, 3, ngf, nd, nb, fused=False, dtype=DTYPE)
    rng = np.random.default_rng(0)
    x_fine = jnp.asarray(rng.normal(size=(B, H, W, in_nc)).astype(np.float32), DTYPE)
    params = gen.init(jax.random.PRNGKey(0), x_fine)["params"]

    fast = _FastTrunk(params, nd, nb, "none", DTYPE)
    w = fast.weights

    results = {}

    def rec(name, fn, x):
        sec = timed_loop(fn, x, iters=args.iters)
        results[name] = round(sec * 1000, 3)
        print(f"{name}: {sec * 1000:.3f} ms", flush=True)

    # control: loop overhead on the fine input
    rec("control_fine", lambda x: x, x_fine)

    # raw re-layouts
    rec("s2d_fine_input", S.space_to_depth, x_fine)
    y_s2d256 = jnp.asarray(
        rng.normal(size=(B, H // 2, W // 2, 4 * ngf)).astype(np.float32), DTYPE
    )
    rec("d2s_256ch_halfres", S.depth_to_space, y_s2d256)
    rec("s2d_64ch_fullres", S.space_to_depth,
        jnp.asarray(rng.normal(size=(B, H, W, ngf)).astype(np.float32), DTYPE))

    # fast stages
    rec("fast_front", lambda x: fast.front(w, x), x_fine)
    h1 = fast.front(w, x_fine)
    rec("fast_mid_down", lambda x: fast.mid_down(w, x), h1)
    h2 = fast.mid_down(w, h1)
    rec("fast_res_blocks", lambda x: fast.res_blocks(w, x), h2)
    rec("fast_mid_up", lambda x: fast.mid_up(w, x), h2)
    h3 = fast.mid_up(w, h2)
    rec("fast_back", lambda x: fast.back(w, x), h3)

    # standard-path equivalents (head+down0 at full res; last up + tail)
    std_apply = functools.partial(gen.apply, {"params": params})

    def std_front(x):
        return gen.apply(
            {"params": params}, x,
            method=lambda m, x: m.down[0](m.head(x)),
        )

    rec("std_front(head+down0)", std_front, x_fine)

    from jpdse_tpu.models.layers import reflect_pad

    def std_back(h):
        def go(m, h):
            h = m.up[nd - 1](h)
            h = reflect_pad(h, 3)
            return jnp.tanh(m.tail(h))

        return gen.apply({"params": params}, h, method=go)

    rec("std_back(uplast+tail)", std_back, h3)

    def std_full(x):
        return std_apply(x)

    rec("std_full", std_full, x_fine)
    rec("fast_full", lambda x: fast(w, x), x_fine)

    print(json.dumps({"batch": B, "ms": results}))


if __name__ == "__main__":
    main()
