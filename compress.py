#!/usr/bin/env python
"""Deploy-time encoder CLI: dataset -> .jpds bitstreams.

The deliverable the reference never shipped: its test.py dumped raw code
bytes that could not be decoded back (test.py:98-110). This writes real
bitstreams (jpdse_tpu/codec_io.py format) that decompress.py reconstructs
from the file + checkpoint alone. Learned (binarized) modules ride as
entropy-coded codes; raw branches — the reference's flagship phase-2
recipe (raw one-hot semantics + base-codec visuals) — ride as v2 side-info
sections (lossless label/instance PNGs + the base codec's own payload).
Every byte a receiver needs is in the file; the printed bpp is the whole
file.

Example:
  python compress.py --load_opt --opt_file runs/learned/opt.json \\
    --checkpoints_dir runs/learned --save_dir out/bitstreams \\
    --root_dir /data/cityscapes --mode val
"""

import json
import os

from jpdse_tpu.platform import honor_jax_platforms_env, init_distributed

honor_jax_platforms_env()
init_distributed()  # no-op unless a multi-process run is configured

from jpdse_tpu.cli import parse_config, print_config
from jpdse_tpu.config import derive_eval_config
from jpdse_tpu.data import create_dataloader
from jpdse_tpu.trainer import Trainer


def main():
    cfg = parse_config(is_train=False)
    eval_mode = cfg.mode if cfg.mode in ("val", "test") else "test"
    cfg = derive_eval_config(cfg, mode=eval_mode)
    cfg.mode = eval_mode
    print("\ncompress options:\n")
    print_config(cfg)

    loader = create_dataloader(cfg)
    # keep consuming the same iterator the sample came from (a fresh
    # iter(loader) would leave the first one's producer thread prefetching
    # full-res batches nobody reads)
    import itertools

    it = iter(loader)
    sample_batch = next(it)
    trainer = Trainer(cfg, mode="test", sample_batch=sample_batch)
    trainer.load()

    os.makedirs(cfg.save_dir, exist_ok=True)
    total_bits, total_pixels, n = 0, 0, 0
    for batch in itertools.chain([sample_batch], it):
        streams = trainer.compress(batch)
        h, w = batch["image"].shape[1:3]
        for j, stream in enumerate(streams):
            base = os.path.splitext(os.path.basename(batch["path"][j]))[0]
            path = os.path.join(cfg.save_dir, base + ".jpds")
            with open(path, "wb") as f:
                f.write(stream)
            total_bits += len(stream) * 8
            total_pixels += h * w
            n += 1
            print(f"{path}: {len(stream)} bytes "
                  f"({len(stream) * 8 / (h * w):.4f} bpp)")
    summary = {"n_images": n, "avg_bpp": total_bits / max(total_pixels, 1)}
    with open(os.path.join(cfg.save_dir, "compress_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\ncompressed {n} images, avg {summary['avg_bpp']:.4f} bpp")


if __name__ == "__main__":
    main()
