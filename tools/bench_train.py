#!/usr/bin/env python
"""Training-step throughput benchmark: the full GAN step (G fwd, 3 D passes,
2 VGG passes, both losses, both Adam updates) on the real TPU at Cityscapes
1024x512 bf16.

Prints one JSON line {"metric": "train_step_throughput_1024x512", ...}.

Timing protocol per CLAUDE.md: the axon relay makes block_until_ready a no-op
and device fetches ~100KB/s, so iterations are chained through the train
state inside one fori_loop (true data dependency) and synced on a scalar
fetch, two-point T(n2)-T(n1).

Usage: python tools/bench_train.py [--batch 2] [--remat]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--no-vgg", action="store_true")
    ap.add_argument("--no-gan", action="store_true",
                    help="drop the GAN machinery (3 D passes, D update, "
                         "gan+feat-match losses) — with --no-vgg this times "
                         "the distortion-only step: G fwd/bwd + Adam + "
                         "input assembly. Subtraction against the full step "
                         "gives the train-stage ledger (PERF.md)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--bf16-inputs", action="store_true",
                    help="feed the batch in bf16 (halves the one-hot/VGG "
                         "input-side activation memory)")
    ap.add_argument("--vgg-chunk", type=int, default=0,
                    help="evaluate the VGG loss N images at a time "
                         "(exact; divides fp32 VGG peak memory by B/N)")
    ap.add_argument("--vgg-bf16", action="store_true",
                    help="run the VGG trunk in bf16 (optim.vgg_bf16)")
    ap.add_argument("--fast-train", action="store_true",
                    help="train the generator through the s2d re-expression "
                         "(optim.fast_train, models/fast_train.py)")
    args = ap.parse_args()

    import __graft_entry__ as ge
    from jpdse_tpu.models import build_discriminator
    from jpdse_tpu.models.codec import SemanticCodec
    from jpdse_tpu.models.vgg import init_vgg19
    from jpdse_tpu.train.state import create_train_state
    from jpdse_tpu.train.step import make_train_step

    cfg = ge._flagship_cfg()
    if args.no_vgg:
        cfg.loss.no_vgg_loss = True
    if args.no_gan:
        cfg.loss.no_g_gan_loss = True
        cfg.loss.no_d_gan_loss = True
        cfg.loss.no_gan_feat_loss = True
    cfg.optim.remat = args.remat
    cfg.optim.vgg_chunk = args.vgg_chunk
    cfg.optim.fast_train = args.fast_train

    codec = SemanticCodec(cfg)
    params_g = ge._init_params(cfg, codec)
    disc = build_discriminator(cfg)
    d_in = jnp.zeros((1, 64, 128, cfg.netD_input_nc), jnp.float32)
    params_d = disc.init(jax.random.PRNGKey(3), d_in)["params"]
    state = create_train_state(cfg, params_g, params_d)

    vgg_apply = None
    if not cfg.loss.no_vgg_loss:
        vgg_model, vgg_vars = init_vgg19(0, None)
        if args.vgg_bf16:
            from jpdse_tpu.models.vgg import Vgg19Features

            cfg.optim.vgg_bf16 = True
            vgg_model = Vgg19Features(dtype=jnp.bfloat16)
            vgg_vars = jax.tree.map(lambda a: a.astype(jnp.bfloat16), vgg_vars)
        vgg_apply = lambda x: vgg_model.apply(vgg_vars, x)  # noqa: E731

    step = make_train_step(cfg, codec, disc, vgg_apply, donate=False)
    batch = ge._batch(cfg, args.batch, H, W)
    if args.bf16_inputs:
        batch = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
                 for k, v in batch.items()}

    def chained(state, batch, n):
        def body(i, st):
            st2, _ = step(st, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return st2

        return jax.lax.fori_loop(0, n, body, state)

    jchained = jax.jit(chained, static_argnums=2)

    def timed(n):
        t0 = time.perf_counter()
        out = jchained(state, batch, n)
        float(out.steps_taken)  # scalar sync
        return time.perf_counter() - t0

    n1, n2 = 1, 4
    timed(n1), timed(n2)  # compile + warm
    t1 = min(timed(n1) for _ in range(3))
    t2 = min(timed(n2) for _ in range(3))
    per_iter = (t2 - t1) / (n2 - n1)
    mps = args.batch * H * W / 1e6 / per_iter
    print(
        json.dumps(
            {
                "metric": "train_step_throughput_1024x512",
                "value": round(mps, 3),
                "unit": "MP/s/chip",
                "batch": args.batch,
                "sec_per_step": round(per_iter, 4),
                "vgg": not cfg.loss.no_vgg_loss,
                "gan": not args.no_gan,
                "remat": args.remat,
                "bf16_inputs": args.bf16_inputs,
                "vgg_chunk": args.vgg_chunk,
                "vgg_bf16": args.vgg_bf16,
                "fast_train": args.fast_train,
            }
        )
    )


if __name__ == "__main__":
    main()
