#!/usr/bin/env python
"""R-D parity measurement: fill BASELINE.md with PSNR / MS-SSIM / L1 / bpp
per base-codec operating point, measured by BOTH stacks on the bundled
30-image Cityscapes set.

Protocol (reference test.py:114-125 + pix2pixHD_model.py:468-492): phase-2
inference configuration (--no_label_encoding --no_feat_encoding
--no_generator_binarization --use_compressed), fixed 1024x512, metrics on
denormalized uint8 images; rate = real base-codec bitstream bytes / pixels.

The golden stack is the reference architecture rebuilt from spec in torch
(convert/torch_ref.py) with seeded reference-init weights; the same weights
are imported into this framework via convert/torch_import.py. Parity =
per-operating-point |dPSNR| <= 0.05 dB and |dMS-SSIM| <= 0.001 between the
two stacks.

Usage:
  python tools/measure_rd.py --ext jpg --qualities 30,50,70,90 \
      --out rd_results_jpg.json [--n-images 30] [--ngf 64] [--device cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ext", default="jpg", choices=["jpg", "webp", "j2k", "avif", "heif", "bpg"])
    ap.add_argument("--qualities", default="30,50,70,90")
    ap.add_argument("--n-images", type=int, default=30)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--n-down", type=int, default=4)
    ap.add_argument("--n-blocks", type=int, default=9)
    ap.add_argument("--crop", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fast", action="store_true",
                    help="decode through the --fast_inference path "
                         "(models/fast_codec.py) instead of the standard "
                         "codec — proves the production path meets the "
                         "parity bar too")
    ap.add_argument("--out", default="rd_results.json")
    ap.add_argument(
        "--root", default="/root/reference/datasets/cityscapes_test_CVPR20_1024"
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    torch.set_grad_enabled(False)

    from jpdse_tpu.config import Config, PreprocessConfig, apply_dataset_defaults
    from jpdse_tpu.convert.torch_import import convert_global_generator
    from jpdse_tpu.convert import torch_ref
    from jpdse_tpu.data import create_dataloader
    from jpdse_tpu.models.codec import SemanticCodec, prepare_inputs
    from jpdse_tpu.ops.metrics import denormalize_to_uint8, ms_ssim, psnr
    from jpdse_tpu.train.step import make_infer_fn

    # ---- phase-2 inference configuration ---------------------------------
    cfg = Config()
    cfg.mode = "val"
    cfg.is_train = False
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.data.root_dir = args.root
    cfg.data.num_workers = 0
    cfg.data.max_dataset_size = args.n_images
    cfg.data.preprocess = PreprocessConfig("fixed", args.crop, args.crop, 2.0)
    cfg.data.normalize_std = (1.0, 1.0, 1.0)  # phase-2 recipe (train.sh:5-7)
    m = cfg.model
    m.no_label_encoding = True
    m.no_feat_encoding = True
    m.no_generator_binarization = True
    m.ngf = args.ngf
    m.n_downsample_global = args.n_down
    m.n_blocks_global = args.n_blocks
    cfg.codec.use_compressed = True
    cfg.codec.ext = args.ext
    cfg.validate()
    sem_nc = cfg.data.semantic_nc

    # ---- golden torch model + weight import ------------------------------
    gen_t = torch_ref.build_phase2_generator(
        sem_nc, m.input_nc, args.ngf, args.n_down, args.n_blocks, seed=args.seed
    )
    sd = {k: v.numpy() for k, v in gen_t.state_dict().items()}
    params = {
        "netG": convert_global_generator(
            sd, args.n_down, args.n_blocks, binarize=False
        )
    }
    codec = SemanticCodec(cfg)
    if args.fast:
        from jpdse_tpu.models.fast_codec import FastCodec

        fast = FastCodec(cfg, params, dtype=jnp.float32)

        def infer(p, mstate, batch):
            return fast.decode(batch)

    else:
        infer = make_infer_fn(cfg, codec)

    mean, std = cfg.data.normalize_mean, cfg.data.normalize_std
    h, w = args.crop // 2, args.crop
    results = {"config": vars(args), "points": []}

    for q in [int(x) for x in args.qualities.split(",")]:
        cfg.codec.quality = (q,)
        loader = create_dataloader(cfg)
        acc = {k: 0.0 for k in (
            "psnr_jax", "psnr_torch", "msssim_jax", "msssim_torch",
            "l1_jax", "l1_torch", "mse_jax", "mse_torch", "bpp",
        )}
        n = 0
        t0 = time.time()
        for bi, batch in enumerate(loader):
            label = np.asarray(batch["label"])
            inst = np.asarray(batch["instance"])
            image = np.asarray(batch["image"])
            comp = np.asarray(batch["compressed"])
            nbytes = np.asarray(batch["base_codec_bytes"]).reshape(-1)

            # --- framework decode ---
            fake_j = np.asarray(infer(params, {}, {
                "label": batch["label"], "instance": batch["instance"],
                "image": batch["image"], "compressed": batch["compressed"],
            }))

            # --- golden torch decode (independently assembled input) ---
            for j in range(image.shape[0]):
                g_in = torch_ref.phase2_generator_input(
                    label[j], inst[j], comp[j], sem_nc
                )
                # cross-check the two stacks' preprocessing agrees bit-exactly
                jax_in = prepare_inputs(
                    cfg, jnp.asarray(label[j][None]), jnp.asarray(inst[j][None]),
                    jnp.asarray(image[j][None]), jnp.asarray(comp[j][None]),
                )
                jax_concat = np.concatenate(
                    [np.asarray(jax_in["input_label"][0]),
                     np.asarray(jax_in["compressed_img"][0])], axis=-1
                )
                pp_err = np.abs(g_in - jax_concat).max()
                assert pp_err == 0.0, f"preprocessing mismatch: {pp_err}"

                fake_t = torch_ref.torch_decode(gen_t, g_in)[0]

                real_u8 = np.asarray(denormalize_to_uint8(
                    jnp.asarray(image[j]), mean, std))
                fj_u8 = np.asarray(denormalize_to_uint8(
                    jnp.asarray(fake_j[j]), mean, std))
                ft_u8 = np.asarray(denormalize_to_uint8(
                    jnp.asarray(fake_t), mean, std))

                for tag, rec in (("jax", fj_u8), ("torch", ft_u8)):
                    acc[f"psnr_{tag}"] += float(psnr(jnp.asarray(rec), jnp.asarray(real_u8)))
                    acc[f"msssim_{tag}"] += float(ms_ssim(
                        jnp.asarray(rec)[None], jnp.asarray(real_u8)[None]))
                    acc[f"l1_{tag}"] += float(np.mean(np.abs(rec - real_u8)))
                    acc[f"mse_{tag}"] += float(np.mean((rec - real_u8) ** 2))
                acc["bpp"] += float(nbytes[j]) * 8.0 / (h * w)
                n += 1
            print(f"[{args.ext} q={q}] {n}/{args.n_images} "
                  f"({time.time() - t0:.0f}s elapsed)", flush=True)

        point = {k: v / n for k, v in acc.items()}
        point.update(ext=args.ext, quality=q, n_images=n)
        point["dpsnr"] = abs(point["psnr_jax"] - point["psnr_torch"])
        point["dmsssim"] = abs(point["msssim_jax"] - point["msssim_torch"])
        results["points"].append(point)
        print(json.dumps(point), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    print("\n=== parity summary ===")
    ok = True
    for p in results["points"]:
        verdict = "OK" if (p["dpsnr"] <= 0.05 and p["dmsssim"] <= 0.001) else "FAIL"
        ok &= verdict == "OK"
        print(f"{p['ext']} q={p['quality']}: bpp={p['bpp']:.4f} "
              f"PSNR {p['psnr_jax']:.3f} vs {p['psnr_torch']:.3f} "
              f"(d={p['dpsnr']:.4f}dB) MS-SSIM {p['msssim_jax']:.5f} vs "
              f"{p['msssim_torch']:.5f} (d={p['dmsssim']:.6f}) [{verdict}]")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
