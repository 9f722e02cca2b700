#!/usr/bin/env python
"""Probe: can a Pallas (Mosaic) matmul at the s2d head conv's effective
shape reach the res-block conv rate?

The flagship head conv runs at ~98 TFLOP/s vs ~158 for the 1024-channel res
blocks (CLAUDE.md). Its im2col form is a (M, K=16*160=2560) x (2560, 256)
matmul — K and N both 128-aligned. If a plain blocked Pallas matmul at that
shape hits ~158, the conv's gap is windowing/emitter overhead that a custom
im2col kernel could (partly) recover; if Mosaic also lands ~100, there is
nothing to chase.

Usage: python tools/bench_pallas_matmul.py [--m 65536]
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

K, N = 2560, 256  # 16 taps x 160 s2d channels -> 4*64 outputs
BM = 512


def pallas_mm(a, b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = a.shape[0]

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(m // BM,),
        interpret=(jax.default_backend() == "cpu"),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.bfloat16),
    )(a, b)


def xla_mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def timed_loop(fn, w, x, iters=8, reps=3):
    """CLAUDE.md relay protocol: chain iterations with a true data
    dependency, sync on a scalar, two-point measurement."""

    def chained(w, x, n):
        def body(_, carry):
            out = fn(carry, w)
            dep = jnp.mean(out.astype(jnp.float32)) * 1e-30
            return (carry + dep.astype(carry.dtype)).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    j = jax.jit(chained, static_argnums=2)

    def t(n):
        t0 = time.perf_counter()
        out = j(w, x, n)
        float(jnp.sum(out[0, 0]))
        return time.perf_counter() - t0

    n1, n2 = 1, 1 + iters
    t(n1), t(n2)
    t1 = min(t(n1) for _ in range(reps))
    t2 = min(t(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    m = args.m

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, K)).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32), jnp.bfloat16)

    flops = 2.0 * m * K * N
    results = {}
    for name, fn in (("pallas_mm", pallas_mm), ("xla_mm", xla_mm)):
        sec = timed_loop(fn, b, a, iters=args.iters)
        tf = flops / sec / 1e12
        results[name] = {"ms": round(sec * 1000, 3), "tflops": round(tf, 1)}
        print(f"{name}: {sec * 1000:.3f} ms = {tf:.1f} TFLOP/s", flush=True)
    print(json.dumps({"m": m, "k": K, "n": N, "results": results}))


if __name__ == "__main__":
    main()
