#!/usr/bin/env python3
"""Probe the relay D2H host-memory leak and whether malloc_trim reclaims it.

Round-3 ops note (CLAUDE.md): every device->host fetch of a large array
leaks its host copy somewhere below user code (reproduced with pure-numpy
trees handed to Orbax -> the leak is in the relay client's D2H path inside
libaxon_pjrt.so, not in Orbax). This probe measures:

  1. RSS growth per fetch of a DEVICE_MB-sized device array (the leak rate),
  2. whether glibc ``malloc_trim(0)`` returns the leaked pages to the OS
     (i.e. the "leak" is freed-but-retained arena memory, fixable by a
     trim after every checkpoint save),
  3. whether ``MALLOC_ARENA_MAX=1``/``mallopt`` changes the picture.

Usage:  python tools/probe_leak_trim.py [--mb 256] [--n 4]
Writes one JSON line per stage; exit 0 always (diagnostic).
"""
import argparse
import ctypes
import gc
import json
import os


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1048576.0
    return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    libc = ctypes.CDLL("libc.so.6")

    n_elem = args.mb * 1048576 // 4
    x = jnp.arange(n_elem, dtype=jnp.float32)  # on the default (TPU) device
    _ = float(x[0])  # materialize
    print(json.dumps({"stage": "baseline", "rss_gb": round(rss_gb(), 3)}))

    for i in range(args.n):
        host = np.asarray(x)
        assert host[1] == 1.0
        del host
        gc.collect()
        print(json.dumps({"stage": f"after_fetch_{i}", "rss_gb": round(rss_gb(), 3)}))

    before = rss_gb()
    freed = libc.malloc_trim(0)
    after = rss_gb()
    print(json.dumps({
        "stage": "after_malloc_trim", "rss_gb": round(after, 3),
        "trim_returned_pages": bool(freed),
        "reclaimed_gb": round(before - after, 3),
    }))

    # one more fetch after the trim: does the arena get reused now?
    host = np.asarray(x)
    del host
    gc.collect()
    print(json.dumps({"stage": "fetch_after_trim", "rss_gb": round(rss_gb(), 3)}))
    libc.malloc_trim(0)
    print(json.dumps({"stage": "final_trim", "rss_gb": round(rss_gb(), 3)}))


if __name__ == "__main__":
    main()
