#!/usr/bin/env python
"""Evaluation entry point — same surface as the reference test.py:1-149:
optional input-noise injection, rate eval (Shannon + actual bpp of binary
codes), reconstruction dump into an HTML gallery, binary code dumps to
``codes/<name>_code`` (plus real entropy-coded ``.rc`` bitstreams), and
L1/MSE/MS-SSIM (+PSNR) on denormalized uint8 images.

Example (QF sweep, scripts/pix2pixHD_bpg_test.sh):
  python test.py --load_opt --opt_file runs/bpg33/opt.json \\
    --checkpoints_dir runs/bpg33 --save_dir out/q33 \\
    --root_dir /data/cityscapes --do_not_get_codes
"""

import json
import os

from jpdse_tpu.platform import honor_jax_platforms_env, init_distributed

honor_jax_platforms_env()
init_distributed()  # no-op unless a multi-process run is configured

from jpdse_tpu.cli import parse_config, print_config
from jpdse_tpu.config import derive_eval_config
from jpdse_tpu.data import create_dataloader
from jpdse_tpu.eval.harness import evaluate
from jpdse_tpu.trainer import Trainer
from jpdse_tpu.utils.visualizer import HTMLGallery, Visualizer


def main():
    cfg = parse_config(is_train=False)
    # evaluate on the split the user asked for (--mode val evaluates the val
    # split; default is the test split)
    eval_mode = cfg.mode if cfg.mode in ("val", "test") else "test"
    cfg = derive_eval_config(cfg, mode=eval_mode)
    cfg.mode = eval_mode
    print("\ntest options:\n")
    print_config(cfg)

    loader = create_dataloader(cfg)
    sample_it = iter(loader)
    sample_batch = next(sample_it)
    sample_it.close()  # stop its prefetch producer before the real pass
    trainer = Trainer(cfg, mode="test", sample_batch=sample_batch)
    trainer.load()

    visualizer = Visualizer(cfg)
    gallery = HTMLGallery(
        os.path.join(cfg.save_dir, "test_visualizations"), "visualizations"
    )

    avgs = evaluate(cfg, trainer, loader, visualizer, gallery)

    print("\ntest done!\n")
    msg = (
        "test set avg recon loss (L1/MSE/MS-SSIM/PSNR) "
        f"{avgs['L1']:.4f}/{avgs['MSE']:.4f}/{avgs['MS-SSIM']:.4f}/{avgs['PSNR']:.2f}dB"
    )
    if not cfg.do_not_get_codes and cfg.has_binary_codes:
        msg += (
            f", avg pre-/(estimated) post-entropy coding bpp "
            f"{avgs['actual_bpp']:.4f}/{avgs['shannon_bpp']:.4f}"
        )
        if avgs.get("coded_bpp") is not None:
            msg += f", actual entropy-coded bpp {avgs['coded_bpp']:.4f}"
        else:
            msg += ", actual entropy-coded bpp unavailable (coder failed)"
    if avgs.get("base_codec_bpp"):
        msg += f", base-codec bpp {avgs['base_codec_bpp']:.4f}"
    if avgs.get("total_bpp") is not None:
        msg += f", total bpp {avgs['total_bpp']:.4f}"
    else:
        # --do_not_get_codes on a binarized config: the learned-code rate
        # was not measured, so no honest total exists
        msg += ", total bpp not measured (codes skipped)"
    print(msg)
    if cfg.save_dir:
        with open(os.path.join(cfg.save_dir, "metrics.json"), "w") as f:
            json.dump(avgs, f, indent=2)


if __name__ == "__main__":
    main()
