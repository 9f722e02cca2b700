#!/usr/bin/env python
"""Initialize the flagship codec's parameters on the HOST CPU and pickle the
numpy tree to argv[1].

Run as a subprocess with JAX_PLATFORMS=cpu by bench.py's fast-path mode: the
axon runtime registers only the TPU backend in-process, and pulling
TPU-initialized params back to host crawls at ~100KB/s over the relay —
a fresh CPU-process init is the fast path to host-resident weights.
"""

import os
import pickle
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import numpy as np

import __graft_entry__ as ge
from jpdse_tpu.models.codec import SemanticCodec


def main():
    cfg = ge._flagship_cfg()
    codec = SemanticCodec(cfg)
    params = ge._init_params(cfg, codec)
    host = jax.tree.map(np.asarray, params)
    with open(sys.argv[1], "wb") as f:
        pickle.dump(host, f)
    print(f"wrote host params to {sys.argv[1]}")


if __name__ == "__main__":
    main()
