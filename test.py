#!/usr/bin/env python
"""Evaluation entry point — same surface as the reference test.py:1-149:
optional input-noise injection, rate eval (Shannon + actual bpp of binary
codes), reconstruction dump into an HTML gallery, binary code dumps to
``codes/<name>_code``, and L1/MSE/MS-SSIM (+PSNR) on denormalized uint8
images. The reference's batch>1 averaging bug (test.py:140) is fixed by
averaging per-image.

Example (QF sweep, scripts/pix2pixHD_bpg_test.sh):
  python test.py --load_opt --opt_file runs/bpg33/opt.json \\
    --checkpoints_dir runs/bpg33 --save_dir out/q33 \\
    --root_dir /data/cityscapes --do_not_get_codes
"""

import json
import os
import time

import numpy as np

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax.numpy as jnp

from jpdse_tpu.cli import parse_config, print_config
from jpdse_tpu.config import derive_eval_config
from jpdse_tpu.data import create_dataloader
from jpdse_tpu.ops.metrics import denormalize_to_uint8, ms_ssim, psnr
from jpdse_tpu.trainer import Trainer
from jpdse_tpu.utils.visualizer import HTMLGallery, Visualizer


def add_noise(batch, cfg, rng):
    """Test-time robustness eval (test.py:61-74). Gaussian supported; the
    reference raises NotImplementedError for poisson/uniform."""
    img = batch["image"]
    mx, mn = img.max(), img.min()
    if "normal" in cfg.data.noise_distribution:
        img = img + rng.normal(cfg.data.noise_mean, cfg.data.noise_std, img.shape).astype(
            np.float32
        )
    else:
        raise NotImplementedError(
            f"noise distribution {cfg.data.noise_distribution} not supported"
        )
    batch["image"] = np.clip(img, mn, mx)
    return batch


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
    sample_batch = next(iter(loader))
    trainer = Trainer(cfg, mode="test", sample_batch=sample_batch)
    trainer.load()

    visualizer = Visualizer(cfg)
    gallery = HTMLGallery(os.path.join(cfg.save_dir, "test_visualizations"), "visualizations")

    get_codes = not cfg.do_not_get_codes
    if get_codes:
        os.makedirs(os.path.join(cfg.save_dir, "codes"), exist_ok=True)

    rng = np.random.default_rng(cfg.optim.seed or 0)
    mean, std = cfg.data.normalize_mean, cfg.data.normalize_std
    totals = {"L1": 0.0, "MSE": 0.0, "PSNR": 0.0, "MS-SSIM": 0.0, "shannon_bpp": 0.0, "actual_bpp": 0.0}
    n_images = 0

    start = time.time()
    for i, batch in enumerate(loader):
        if cfg.data.add_noise:
            batch = add_noise(batch, cfg, rng)

        if get_codes:
            shannon_bpp, actual_bpp = trainer.get_eval_rate(batch)
            totals["shannon_bpp"] += shannon_bpp * batch["image"].shape[0]
            totals["actual_bpp"] += actual_bpp * batch["image"].shape[0]

        recon = trainer.get_img(batch)
        for j in range(recon.shape[0]):
            visuals = {}
            if not cfg.model.no_label:
                visuals["label"] = batch["label"][j]
            visuals["image"] = batch["image"][j]
            visuals["reconstructed_image"] = recon[j]
            visualizer.save_images(gallery, visuals, batch["path"][j])

            if get_codes:
                codes = trainer.get_code(batch)
                base = os.path.splitext(os.path.basename(batch["path"][j]))[0]
                with open(os.path.join(cfg.save_dir, "codes", base + "_code"), "wb") as f:
                    f.write(np.asarray(codes[j]).astype(np.uint8).tobytes())
                # real entropy-coded bitstream (the reference only dumps one
                # raw byte per bit and estimates rate; the native range coder
                # produces an actual compressed stream)
                try:
                    from jpdse_tpu import native

                    stream = native.entropy_encode(
                        np.asarray(codes[j]).astype(np.uint8)
                    )
                    with open(
                        os.path.join(cfg.save_dir, "codes", base + "_code.rc"), "wb"
                    ) as f:
                        f.write(stream)
                    h, w = batch["image"].shape[1:3]
                    totals["coded_bpp"] = totals.get("coded_bpp", 0.0) + len(
                        stream
                    ) * 8.0 / (h * w)
                except Exception:
                    pass
        gallery.save()

        recon_u8 = denormalize_to_uint8(jnp.asarray(recon), mean, std)
        real_u8 = denormalize_to_uint8(jnp.asarray(batch["image"]), mean, std)
        b = recon.shape[0]
        l1_v = float(jnp.mean(jnp.abs(recon_u8 - real_u8)))
        mse_v = float(jnp.mean((recon_u8 - real_u8) ** 2))
        psnr_v = float(psnr(recon_u8, real_u8))
        msssim_v = float(ms_ssim(recon_u8, real_u8))
        totals["L1"] += l1_v * b
        totals["MSE"] += mse_v * b
        totals["PSNR"] += psnr_v * b
        totals["MS-SSIM"] += msssim_v * b
        n_images += b

        end = time.time()
        print(
            f"batch {i + 1}/{len(loader)}, recon loss (L1/MSE/MS-SSIM/PSNR) "
            f"{l1_v:.4f}/{mse_v:.4f}/{msssim_v:.4f}/{psnr_v:.2f}dB, "
            f"batch processing time (s) {end - start:.4f}"
        )
        start = time.time()

    print("\ntest done!\n")
    avgs = {k: v / max(n_images, 1) for k, v in totals.items()}
    print(
        "test set avg recon loss (L1/MSE/MS-SSIM/PSNR) "
        f"{avgs['L1']:.4f}/{avgs['MSE']:.4f}/{avgs['MS-SSIM']:.4f}/{avgs['PSNR']:.2f}dB"
        + (
            f", avg pre-/post-entropy-coding bpp {avgs['actual_bpp']:.4f}/{avgs['shannon_bpp']:.4f}"
            if get_codes
            else ""
        )
    )
    if cfg.save_dir:
        with open(os.path.join(cfg.save_dir, "metrics.json"), "w") as f:
            json.dump(avgs, f, indent=2)


if __name__ == "__main__":
    main()
