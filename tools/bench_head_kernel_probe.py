#!/usr/bin/env python
"""Cost-isolation probes for the VMEM-im2col head-conv kernel.

v1 of ops/pallas/head_conv.py measured 24.2 ms for the netG front vs the
XLA conv's 20.8 (batch 8, v5e) — the A-build copies, not the dot, dominate
(the K=2496-aligned dot alone is ~3.3 us/step; steps measured ~11.8 us).
This probe times kernel VARIANTS that each remove one suspected cost so the
lowering bottleneck is identified with data, not guesses:

  real   — the v1 kernel (16 shifted copies + one K=16C dot)
  dx0    — copies without the dx sublane shift (reads row[0:Wo] always):
           isolates the sublane-shift cost (results wrong; timing only)
  nocopy — dot on uninitialized scratch (no copies at all): the dot +
           view-fetch floor
  c128   — run any variant with --cin 128 so every lane write offset
           (t*C % 128) is 0: isolates lane-misalignment (vs --cin 156)

Usage: python tools/bench_head_kernel_probe.py [--variant real|dx0|nocopy]
         [--cin 156] [--batch 8]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.bench_fast_stages import timed_loop


def make_probe(kp, wo, cin, variant):
    def _kernel(*refs):
        xs = refs[:kp]
        w_ref = refs[kp]
        o_ref = refs[kp + 1]
        a_ref = refs[kp + 2]
        if variant != "nocopy":
            for dy in range(kp):
                row = xs[dy][0, 0]
                for dx in range(kp):
                    t = dy * kp + dx
                    src = row[0:wo, :] if variant == "dx0" else row[dx : dx + wo, :]
                    a_ref[:, t * cin : (t + 1) * cin] = src
        o_ref[0, 0] = jnp.dot(
            a_ref[:], w_ref[:], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    return _kernel


def probe_conv(xp, w_folded, kp, variant):
    bsz, hp, wp_, c = xp.shape
    ktot, n = w_folded.shape
    ho, wo = hp - kp + 1, wp_ - kp + 1
    in_specs = [
        pl.BlockSpec((1, 1, wp_, c), lambda bi, j, dy=dy: (bi, j + dy, 0, 0))
        for dy in range(kp)
    ]
    in_specs.append(pl.BlockSpec((ktot, n), lambda bi, j: (0, 0)))
    return pl.pallas_call(
        make_probe(kp, wo, c, variant),
        grid=(bsz, ho),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, wo, n), lambda bi, j: (bi, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, n), xp.dtype),
        scratch_shapes=[pltpu.VMEM((wo, ktot), xp.dtype)],
    )(*([xp] * kp), w_folded)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cin", type=int, default=156)
    ap.add_argument("--cout", type=int, default=256)
    ap.add_argument("--hw", default="512x1024")
    ap.add_argument("--variants", default="real,dx0,nocopy")
    args = ap.parse_args()
    h, w_ = (int(v) for v in args.hw.split("x"))
    hp, wp_ = h // 2 + 3, w_ // 2 + 3
    kp, c, n = 4, args.cin, args.cout
    rng = np.random.default_rng(0)
    xp = jnp.asarray(
        rng.normal(size=(args.batch, hp, wp_, c)).astype(np.float32), jnp.bfloat16
    )
    wf = jnp.asarray(
        rng.normal(size=(kp * kp * c, n)).astype(np.float32), jnp.bfloat16
    )
    results = {}
    for variant in args.variants.split(","):
        if variant == "v2":
            # the shipped kernel (ops/pallas/head_conv.py), raw: padded-s2d
            # input handed over directly, no producer/consumer context
            from jpdse_tpu.ops.pallas.head_conv import (
                head_conv_extra_rows,
                head_conv_s2d_pallas,
            )

            ho = hp - kp + 1
            extra = head_conv_extra_rows(ho, kp)
            xp2 = jnp.pad(xp, ((0, 0), (0, extra), (0, 0), (0, 0)))
            wf2 = jnp.asarray(
                np.asarray(wf, np.float32).reshape(kp, kp, c, n)
                .reshape(kp, kp * c, n), jnp.bfloat16
            )
            sec = timed_loop(
                lambda w_arg, x: head_conv_s2d_pallas(x, w_arg, kp, ho=ho),
                wf2, xp2,
            )
        else:
            sec = timed_loop(
                lambda w_arg, x, v=variant: probe_conv(x, w_arg, kp, v), wf, xp
            )
        results[variant] = round(sec * 1000, 3)
        print(f"{variant}: {sec * 1000:.3f} ms", flush=True)
    print(json.dumps({"batch": args.batch, "cin": c, "ms": results}))


if __name__ == "__main__":
    main()
