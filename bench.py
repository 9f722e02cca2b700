#!/usr/bin/env python
"""Benchmark: flagship encode+decode throughput (MP/s/chip) at Cityscapes
1024x512, bf16, on the real TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference runs this model in torch on CPU (multi-GPU is
explicitly unsupported, base_parser.py:236; BASELINE.md pins the north star
at >=10x CPU-reference MP/s per chip). The reference stack itself cannot run
here (its VGG import needs torchvision, absent from this image), so the
baseline is a torch-CPU replica of the same flagship architecture, measured
once and cached in BASELINE_MEASURED.json.
"""

import json
import os
import sys
import time

import numpy as np

# larger batches lift MXU utilization on the low-channel full-res convs
# (measured fast path on v5e: 11.8 MP/s @ b2 -> 33.63 @ b8 -> 34.32 @ b16
# [round 2] -> 37.5 @ b16 / 38.3 @ b24 / 33.9 @ b28 [round 3, Pallas
# realign on — b28 regresses under HBM pressure; b32 OOMs at 18.9G of
# 15.75G]); JPDSE_BENCH_BATCH probes other sizes
H, W, BATCH = 512, 1024, int(os.environ.get("JPDSE_BENCH_BATCH", "24"))
WARMUP, ITERS = 3, 10
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")


def measure_torch_cpu_baseline() -> float:
    """Torch-CPU replica of the flagship encode+decode (label encoder +
    visual encoder + global generator, reference architecture/sizes) at
    1024x512; returns MP/s."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)

    def conv_block(i, o, k, s, p):
        return [nn.Conv2d(i, o, k, s, p), nn.InstanceNorm2d(o), nn.ReLU(True)]

    class Res(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.b = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(d, d, 3), nn.InstanceNorm2d(d),
                nn.ReLU(True), nn.ReflectionPad2d(1), nn.Conv2d(d, d, 3),
                nn.InstanceNorm2d(d),
            )

        def forward(self, x):
            return x + self.b(x)

    def encoder(in_c, out_c, ngf, n_down, bin_ch):
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(in_c, ngf, 7), nn.InstanceNorm2d(ngf), nn.ReLU(True)]
        for i in range(n_down):
            m = 2**i
            layers += conv_block(ngf * m, ngf * m * 2, 3, 2, 1)
        layers += [nn.Conv2d(ngf * 2**n_down, bin_ch, 1, bias=False), nn.Tanh()]
        up_in = bin_ch
        for i in range(n_down):
            m = 2 ** (n_down - i)
            layers += [nn.ConvTranspose2d(up_in, ngf * m // 2, 3, 2, 1, output_padding=1),
                       nn.InstanceNorm2d(ngf * m // 2), nn.ReLU(True)]
            up_in = ngf * m // 2
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, out_c, 7), nn.Tanh()]
        return nn.Sequential(*layers)

    def generator(in_c, out_c, ngf, n_down, n_blocks):
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(in_c, ngf, 7), nn.InstanceNorm2d(ngf), nn.ReLU(True)]
        for i in range(n_down):
            m = 2**i
            layers += conv_block(ngf * m, ngf * m * 2, 3, 2, 1)
        for _ in range(n_blocks):
            layers.append(Res(ngf * 2**n_down))
        for i in range(n_down):
            m = 2 ** (n_down - i)
            layers += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, 2, 1, output_padding=1),
                       nn.InstanceNorm2d(ngf * m // 2), nn.ReLU(True)]
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, out_c, 7), nn.Tanh()]
        return nn.Sequential(*layers)

    netE4label = encoder(36, 36, 64, 4, 128).eval()
    netE = encoder(3, 3, 64, 4, 128).eval()
    netG = generator(36 + 3, 3, 64, 4, 9).eval()

    label = torch.randn(1, 36, H, W)
    image = torch.randn(1, 3, H, W)
    with torch.no_grad():
        def run():
            lab = netE4label(label)
            feat = netE(image)
            return netG(torch.cat([lab, feat], 1))

        run()  # warmup
        n = 2
        t0 = time.perf_counter()
        for _ in range(n):
            run()
        dt = time.perf_counter() - t0
    return n * H * W / 1e6 / dt


NOMINAL_CPU_THREADS = 32  # normalize the baseline to a typical server CPU


def get_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["cpu_reference_mps_normalized"]
    measured = measure_torch_cpu_baseline()
    threads = os.cpu_count() or 1
    # this container exposes very few CPUs; scale the measured single-host
    # number linearly up to a nominal 32-thread server (GENEROUS to the
    # baseline — conv scaling is sublinear) so vs_baseline is meaningful
    normalized = measured * max(1.0, NOMINAL_CPU_THREADS / threads)
    with open(BASELINE_FILE, "w") as f:
        json.dump(
            {
                "cpu_reference_mps_measured": measured,
                "cpu_reference_mps_normalized": normalized,
                "threads_measured": threads,
                "normalized_to_threads": NOMINAL_CPU_THREADS,
                "what": "torch-CPU replica of the flagship encode+decode "
                "(1024x512, ngf64/4down/9blocks + 2 binarized encoders); "
                "normalized assumes linear thread scaling (favors the baseline)",
            },
            f,
            indent=2,
        )
    return normalized


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as entrymod

    rng = np.random.default_rng(0)
    from __graft_entry__ import _batch, _flagship_cfg

    cfg = _flagship_cfg()
    bench_batch = _batch(cfg, BATCH, H, W, rng)

    metric_name = "encode_decode_throughput_1024x512"
    # The space-to-depth inference path is the production default: measured
    # 31.95 vs 24.28 MP/s/chip over the standard path at batch 8 (round 2;
    # numerically exact, tests/test_fast_codec.py). JPDSE_FAST=0 benches the
    # standard path.
    if os.environ.get("JPDSE_FAST", "1") == "1":
        # benchmark the space-to-depth inference path: params init on HOST in
        # a CPU subprocess (the axon runtime registers only the TPU backend
        # in-process, and device->host fetches crawl at ~100KB/s over the
        # relay), weights host-transformed once, then passed as jit arguments
        import pickle
        import subprocess
        import sys as _sys
        import tempfile

        from jpdse_tpu.models.fast_codec import FastCodec

        with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as tf:
            params_path = tf.name
        subprocess.run(
            [
                _sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools", "init_flagship_params.py"),
                params_path,
            ],
            check=True,
            capture_output=True,  # keep bench stdout to the single JSON line
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        with open(params_path, "rb") as f:
            host_params = pickle.load(f)
        os.unlink(params_path)
        fast = FastCodec(cfg, host_params)
        params = fast.weights
        fn = fast.decode_fn
    else:
        fn, (params, _) = entrymod.entry()
        metric_name = "encode_decode_throughput_1024x512_std"

    # NOTE on timing: under the axon relay, block_until_ready is effectively
    # a no-op and device->host transfers are extremely slow, so we (a) chain
    # iterations inside one compiled fori_loop by feeding the output image
    # back as the input (true data dependency -> sequential execution),
    # (b) synchronize by fetching a single scalar, and (c) run a two-point
    # measurement T(n2)-T(n1) to cancel the constant fetch latency.
    def chained(params, batch, n):
        def body(_, img):
            out = fn(params, dict(batch, image=img))
            return out.astype(img.dtype)

        return jax.lax.fori_loop(0, n, body, batch["image"])

    jchained = jax.jit(chained)

    def timed(n):
        t0 = time.perf_counter()
        img = jchained(params, bench_batch, n)
        float(jnp.sum(img[0, 0, 0]))  # scalar sync
        return time.perf_counter() - t0

    n1, n2 = 1, 6
    timed(n1), timed(n2)  # compile + warm
    t1 = min(timed(n1) for _ in range(3))
    t2 = min(timed(n2) for _ in range(3))
    per_iter = (t2 - t1) / (n2 - n1)
    mps = BATCH * H * W / 1e6 / per_iter

    baseline = get_baseline()
    print(
        json.dumps(
            {
                "metric": metric_name,
                "value": round(mps, 2),
                "unit": "MP/s/chip",
                "vs_baseline": round(mps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
