#!/usr/bin/env python
"""Train an IN-ENVIRONMENT perceptual-loss feature net (round-4 VERDICT
missing #3): the pretrained torchvision VGG19 the reference's VGGLoss uses
(networks.py:477) is unfetchable here (zero egress), and every round-3
operating point optimized a random-init VGG. This trains the SAME
Vgg19Features trunk (models/vgg.py) to predict the bundled Cityscapes
segmentation labels from images — semantic supervision being exactly what
makes VGG features perceptually meaningful — and writes the trunk as the
``conv{s}_{c}.kernel/.bias`` .npz that ``--vgg_weights_path`` already
consumes, so the loss plumbing is untouched.

Supervision: 1x1-conv heads on the relu3_1 / relu4_1 / relu5_1 slices,
cross-entropy against nearest-downsampled label maps (deep supervision
keeps every slice the VGGLoss weights semantically trained, not just the
last). Inputs are in the flagship's normalized image space
(mean .5, std 1 -> [-0.5, 0.5]) — the space the trainer feeds VGGLoss.

Usage (chip or CPU; ~500 steps of batch 2 at 512x512 crops):
  python tools/train_seg_vgg.py --out artifacts/seg_vgg [--steps 500]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpdse_tpu.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from jpdse_tpu.models.vgg import Vgg19Features


def load_split(root: str, mode: str, size=(1024, 512), num_labels: int = 35):
    imgs, labs = [], []
    for p in sorted(
        glob.glob(os.path.join(root, "leftImg8bit", mode, "*", "*.png"))
    ):
        img = Image.open(p).convert("RGB").resize(size, Image.BICUBIC)
        city_parts = os.path.basename(p).split("_")[:3]
        lab_glob = os.path.join(
            root, "gtFine", mode, "*", "_".join(city_parts) + "*_labelIds.png"
        )
        lp = sorted(glob.glob(lab_glob))
        assert lp, f"no label for {p}"
        lab = Image.open(lp[0]).resize(size, Image.NEAREST)
        imgs.append(np.asarray(img, np.float32) / 255.0 - 0.5)  # trainer space
        labs.append(np.clip(np.asarray(lab, np.int32), 0, num_labels - 1))
    return np.stack(imgs), np.stack(labs)


class SegVgg(nn.Module):
    """Vgg19Features trunk + deep-supervision seg heads (heads are
    supervision scaffolding; only the trunk is exported)."""

    num_labels: int = 35

    @nn.compact
    def __call__(self, x):
        feats = Vgg19Features(name="trunk")(x)
        logits = [
            nn.Conv(self.num_labels, (1, 1), name=f"seg_head{k}")(feats[k])
            for k in (2, 3, 4)  # relu3_1 (1/4), relu4_1 (1/8), relu5_1 (1/16)
        ]
        return feats, logits


def export_trunk(trunk_params, out_path: str):
    """Write the Vgg19Features trunk as the ``conv{s}_{c}.kernel/.bias`` .npz
    layout ``init_vgg19(weights_path=...)`` / ``--vgg_weights_path`` consume
    (models/vgg.py:77-84). Tested by tests/test_seg_vgg.py."""
    arrays = {}
    for name, node in trunk_params.items():
        arrays[f"{name}.kernel"] = np.asarray(node["kernel"], np.float32)
        arrays[f"{name}.bias"] = np.asarray(node["bias"], np.float32)
    np.savez(out_path, **arrays)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/cityscapes_split")
    ap.add_argument("--out", default="artifacts/seg_vgg")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--num_labels", type=int, default=35)
    args = ap.parse_args()

    imgs, labs = load_split(args.root, "train", num_labels=args.num_labels)
    print(f"{imgs.shape[0]} train images {imgs.shape[1:]} -> device")
    n, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    # jit ARGUMENTS, never closures: a closed-over ~140MB dataset gets baked
    # into the compile payload and the remote-compile relay rejects it
    # (HTTP 413) — CLAUDE.md / PERF.md protocol.
    imgs_d = jax.device_put(jnp.asarray(imgs))
    labs_d = jax.device_put(jnp.asarray(labs))

    model = SegVgg(num_labels=args.num_labels)
    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(
        rng, jnp.zeros((1, args.crop, args.crop, 3), jnp.float32)
    )
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    def loss_fn(params, xb, yb):
        _, logits = model.apply({"params": params}, xb)
        loss = 0.0
        for lg in logits:
            f = yb.shape[1] // lg.shape[1]
            yd = yb[:, ::f, ::f]
            loss = loss + optax.softmax_cross_entropy_with_integer_labels(
                lg, yd
            ).mean()
        return loss / len(logits)

    @jax.jit
    def step(params, opt_state, key, imgs_d, labs_d):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        idx = jax.random.randint(k1, (args.batch,), 0, n)
        y0 = jax.random.randint(k2, (args.batch,), 0, H - args.crop + 1)
        x0 = jax.random.randint(k3, (args.batch,), 0, W - args.crop + 1)

        def crop_one(i, y, x):
            xb = jax.lax.dynamic_slice(
                imgs_d[i], (y, x, 0), (args.crop, args.crop, 3)
            )
            yb = jax.lax.dynamic_slice(labs_d[i], (y, x), (args.crop, args.crop))
            return xb, yb

        xb, yb = jax.vmap(crop_one)(idx, y0, x0)
        flip = jax.random.bernoulli(k4, 0.5, (args.batch,))
        xb = jnp.where(flip[:, None, None, None], xb[:, :, ::-1], xb)
        yb = jnp.where(flip[:, None, None], yb[:, :, ::-1], yb)
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    t0 = time.time()
    for i in range(args.steps):
        rng, key = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, key, imgs_d, labs_d)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: seg CE {float(loss):.4f}  ({time.time()-t0:.0f}s)")

    # held-out pixel accuracy (the feature-quality sanity number)
    val_imgs, val_labs = load_split(args.root, "val", num_labels=args.num_labels)

    @jax.jit
    def val_acc(params, xb, yb):
        _, logits = model.apply({"params": params}, xb)
        pred = jnp.argmax(logits[-1], -1)
        yd = yb[:, :: yb.shape[1] // pred.shape[1], :: yb.shape[2] // pred.shape[2]]
        return jnp.mean(pred == yd)

    accs = [
        float(val_acc(params, jnp.asarray(val_imgs[j : j + 1]),
                      jnp.asarray(val_labs[j : j + 1])))
        for j in range(val_imgs.shape[0])
    ]
    print(f"held-out seg pixel acc (1/16 res): {np.mean(accs):.4f}")

    os.makedirs(args.out, exist_ok=True)
    out_path = export_trunk(params["trunk"], os.path.join(args.out, "vgg19_seg.npz"))
    with open(os.path.join(args.out, "TRAIN_META.txt"), "w") as f:
        f.write(
            f"steps={args.steps} batch={args.batch} crop={args.crop} "
            f"lr={args.lr} seed={args.seed}\n"
            f"heldout_pixel_acc_1_16={np.mean(accs):.4f}\n"
        )
    print(f"wrote {out_path} (load with --vgg_weights_path)")


if __name__ == "__main__":
    main()
