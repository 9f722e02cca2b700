#!/usr/bin/env python
"""Benchmark the LocalEnhancer (netG 'local') decode on the real TPU at the
reference's native pix2pixHD resolution, 2048x1024.

The reference's high-res configuration (networks.py:144-196, selected by
--netG local, pix2pixHD_model.py:68) is the pix2pixHD 2048x1024 generator:
global trunk at ngf*2 on the half-res pyramid level + one enhancer at full
res, raw one-hot semantics + edges + image straight in (binarization is
incompatible with 'local' per the reference help text). This benches exactly
that decode, fast (s2d, default) or standard (JPDSE_FAST=0), batch via
JPDSE_BENCH_BATCH (default 4).

Prints ONE JSON line {"metric": ..., "value": MP/s/chip, ...}.

Timing protocol = bench.py's: chained fori_loop iterations (output image fed
back as input), single-scalar sync, two-point T(n2)-T(n1) (the axon relay
makes block_until_ready a no-op).

Self-init mode: invoked with argv[1] == "--init-out" + a path, builds the
SAME config, initializes params on CPU and pickles the numpy tree — the main
(TPU) invocation runs itself as a JAX_PLATFORMS=cpu subprocess (under axon
only the TPU backend is registered in-process; see CLAUDE.md).
"""

import json
import os
import pickle
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np

H, W = 1024, 2048
BATCH = int(os.environ.get("JPDSE_BENCH_BATCH", "4"))
WARM_N, MEAS_N = 1, 4


def local_cfg():
    from jpdse_tpu.config import Config, apply_dataset_defaults

    cfg = Config()
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    m = cfg.model
    # pix2pixHD 2048x1024 recipe: --netG local --ngf 32 (global trunk ngf 64)
    m.netG = "local"
    m.ngf = 32
    m.n_local_enhancers = 1
    m.n_blocks_local = 3
    m.no_label_encoding = True
    m.no_feat_encoding = True
    m.no_generator_binarization = True
    m.compute_dtype = "bfloat16"
    cfg.validate()
    return cfg


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--init-out":
        import jax

        import __graft_entry__ as ge

        cfg = local_cfg()
        from jpdse_tpu.models.codec import SemanticCodec

        codec = SemanticCodec(cfg)
        params = ge._init_params(cfg, codec)
        with open(sys.argv[2], "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, params), f)
        print(f"wrote host params to {sys.argv[2]}")
        return

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as entrymod

    cfg = local_cfg()
    rng = np.random.default_rng(0)
    batch = entrymod._batch(cfg, BATCH, H, W, rng)

    fastmode = os.environ.get("JPDSE_FAST", "1") == "1"
    if fastmode:
        from jpdse_tpu.models.fast_codec import FastCodec

        with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as tf:
            params_path = tf.name
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--init-out", params_path],
            check=True,
            capture_output=True,
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        with open(params_path, "rb") as f:
            host_params = pickle.load(f)
        os.unlink(params_path)
        fast = FastCodec(cfg, host_params)
        params, fn = fast.weights, fast.decode_fn
        metric = "local_decode_throughput_2048x1024"
    else:
        from jpdse_tpu.models.codec import SemanticCodec, prepare_inputs

        codec = SemanticCodec(cfg)
        params = entrymod._init_params(cfg, codec)

        def fn(params, batch):
            inputs = prepare_inputs(
                cfg, batch["label"], batch["instance"], batch["image"]
            )
            fake, _ = codec.apply(
                {"params": params}, inputs, method=SemanticCodec.decode
            )
            return fake

        metric = "local_decode_throughput_2048x1024_std"

    def chained(params, batch, n):
        def body(_, img):
            out = fn(params, dict(batch, image=img))
            return out.astype(img.dtype)

        return jax.lax.fori_loop(0, n, body, batch["image"])

    jchained = jax.jit(chained)

    def timed(n):
        t0 = time.perf_counter()
        img = jchained(params, batch, n)
        float(jnp.sum(img[0, 0, 0]))
        return time.perf_counter() - t0

    timed(WARM_N), timed(MEAS_N)  # compile + warm
    t1 = min(timed(WARM_N) for _ in range(3))
    t2 = min(timed(MEAS_N) for _ in range(3))
    per_iter = (t2 - t1) / (MEAS_N - WARM_N)
    mps = BATCH * H * W / 1e6 / per_iter
    print(json.dumps({
        "metric": metric,
        "value": round(mps, 2),
        "unit": "MP/s/chip",
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
