#!/usr/bin/env python
"""Trace the fast front stage and print where device time goes.

Used to attribute the head-conv Pallas kernel's in-context overhead (raw
kernel 11.6 ms vs 23.9 ms front-stage A/B at batch 8): captures a
jax.profiler trace of a few front() invocations and aggregates device-op
durations from the trace protobuf JSON.

Usage: python tools/profile_front.py [--mode pallas|none] [--batch 8]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="pallas", choices=["pallas", "none"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--out", default="/tmp/front_trace")
    args = ap.parse_args()

    if args.mode == "pallas":
        os.environ["JPDSE_HEAD_PALLAS"] = "1"
    else:
        os.environ.pop("JPDSE_HEAD_PALLAS", None)

    from jpdse_tpu.models.fast_codec import _FastTrunk
    from jpdse_tpu.models.generator import GlobalGenerator

    H, W, in_nc, ngf = 512, 1024, 39, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(args.batch, H, W, in_nc)).astype(np.float32),
        jnp.bfloat16,
    )
    gen = GlobalGenerator(in_nc, 3, ngf, 4, 9, fused=False, dtype=jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    fast = _FastTrunk(params, 4, 9, "none", jnp.bfloat16)
    print(f"mode={args.mode} head_fold={fast.head_fold}", flush=True)

    f = jax.jit(fast.front)
    out = f(fast.weights, x)  # compile outside the trace
    float(jnp.sum(out[0, 0, 0]))

    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        out = f(fast.weights, x)
    float(jnp.sum(out[0, 0, 0]))
    jax.profiler.stop_trace()

    # aggregate device-op durations from the trace JSON
    traces = sorted(
        glob.glob(os.path.join(args.out, "plugins/profile/*/*.trace.json.gz"))
    )
    if not traces:
        print("no trace files found under", args.out)
        return
    with gzip.open(traces[-1], "rt") as fjs:
        data = json.load(fjs)
    events = data.get("traceEvents", [])
    # device lanes: pick pids whose process names mention TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, nm in proc_names.items()
        if "TPU" in nm or "/device" in nm.lower() or "XLA" in nm
    }
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (not device_pids or e.get("pid") in device_pids):
            agg[e["name"]] += e.get("dur", 0) / 1e3  # ms
            cnt[e["name"]] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    total = sum(agg.values())
    print(f"lanes={sorted(proc_names.values())}")
    print(f"total traced op-time {total:.2f} ms over {args.iters} iters")
    for name, ms in top:
        print(f"{ms:9.3f} ms  x{cnt[name]:<3d} {name[:110]}")


if __name__ == "__main__":
    main()
