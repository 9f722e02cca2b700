#!/usr/bin/env python
"""Torch-CPU baseline for the TRAIN step, mirroring bench.py's inference
baseline: a from-spec torch replica of the reference's full flagship GAN
training step (netE4label + netE + netG forward, 2-scale PatchGAN x3
passes, VGG19 perceptual x2, feature matching, L1 distortion, both Adam
updates — the loop of /root/reference/ctu/trainers/pix2pixHD_trainer.py:42-78
at the /root/reference/scripts defaults), measured single-thread at
1024x512 and linearly normalized to a nominal 32-thread server (generous
to the baseline — conv scaling is sublinear), exactly like
BASELINE_MEASURED.json's inference number.

The VGG19 is the reference architecture at random init (torchvision's
pretrained weights are unavailable in this image — the same fallback the
JAX side documents), which is FLOP-identical to the pretrained one.

Writes BASELINE_TRAIN_MEASURED.json next to bench.py and prints one JSON
line. Expect ~10 min on this 1-CPU box.
"""

import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

H, W, BATCH = 512, 1024, 1
NOMINAL_CPU_THREADS = 32
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BASELINE_TRAIN_MEASURED.json")


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
    layers = [nn.ReflectionPad2d(3), nn.Conv2d(in_c, ngf, 7),
              nn.InstanceNorm2d(ngf), nn.ReLU(True)]
    for i in range(n_down):
        m = 2 ** i
        layers += conv_block(ngf * m, ngf * m * 2, 3, 2, 1)
    layers += [nn.Conv2d(ngf * 2 ** n_down, bin_ch, 1, bias=False), nn.Tanh()]
    up_in = bin_ch
    for i in range(n_down):
        m = 2 ** (n_down - i)
        layers += [nn.ConvTranspose2d(up_in, ngf * m // 2, 3, 2, 1, output_padding=1),
                   nn.InstanceNorm2d(ngf * m // 2), nn.ReLU(True)]
        up_in = ngf * m // 2
    layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, out_c, 7), nn.Tanh()]
    return nn.Sequential(*layers)


def generator(in_c, out_c, ngf, n_down, n_blocks):
    layers = [nn.ReflectionPad2d(3), nn.Conv2d(in_c, ngf, 7),
              nn.InstanceNorm2d(ngf), nn.ReLU(True)]
    for i in range(n_down):
        m = 2 ** i
        layers += conv_block(ngf * m, ngf * m * 2, 3, 2, 1)
    for _ in range(n_blocks):
        layers.append(Res(ngf * 2 ** n_down))
    for i in range(n_down):
        m = 2 ** (n_down - i)
        layers += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, 2, 1, output_padding=1),
                   nn.InstanceNorm2d(ngf * m // 2), nn.ReLU(True)]
    layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, out_c, 7), nn.Tanh()]
    return nn.Sequential(*layers)


class NLayerD(nn.Module):
    """networks.py:422-471 geometry (ndf64, n_layers=3, getIntermFeat)."""

    def __init__(self, in_c, ndf=64, n_layers=3):
        super().__init__()
        seqs = [[nn.Conv2d(in_c, ndf, 4, 2, 2), nn.LeakyReLU(0.2, True)]]
        nf = ndf
        for n in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            seqs.append([nn.Conv2d(nf_prev, nf, 4, 2, 2),
                         nn.InstanceNorm2d(nf), nn.LeakyReLU(0.2, True)])
        nf_prev, nf = nf, min(nf * 2, 512)
        seqs.append([nn.Conv2d(nf_prev, nf, 4, 1, 2),
                     nn.InstanceNorm2d(nf), nn.LeakyReLU(0.2, True)])
        seqs.append([nn.Conv2d(nf, 1, 4, 1, 2)])
        self.stages = nn.ModuleList(nn.Sequential(*s) for s in seqs)

    def forward(self, x):
        feats = []
        for s in self.stages:
            x = s(x)
            feats.append(x)
        return feats


class MultiD(nn.Module):
    def __init__(self, in_c, num_d=2):
        super().__init__()
        self.ds = nn.ModuleList(NLayerD(in_c) for _ in range(num_d))

    def forward(self, x):
        outs = []
        for i, d in enumerate(self.ds):
            outs.append(d(x))
            x = F.avg_pool2d(x, 3, 2, 1, count_include_pad=False)
        return outs


def vgg19_features():
    """torchvision VGG19 .features geometry (networks.py:474-504 slices)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512]  # up to relu5_1 (slice 5 end)
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, 1, 1), nn.ReLU(True)]
            in_c = v
    return nn.Sequential(*layers)


def main():
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    netE4label = encoder(36, 36, 64, 4, 128)
    netE = encoder(3, 3, 64, 4, 128)
    netG = generator(36 + 3, 3, 64, 4, 9)
    netD = MultiD(36 + 3)
    vgg = vgg19_features().eval()
    for p in vgg.parameters():
        p.requires_grad_(False)
    # VGG slice boundaries in layer indices (relu1_1..relu5_1) and weights
    slices = [2, 7, 12, 21, 30]
    vgg_w = [1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0]

    g_params = (list(netG.parameters()) + list(netE.parameters())
                + list(netE4label.parameters()))
    opt_g = torch.optim.Adam(g_params, lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(netD.parameters(), lr=2e-4, betas=(0.5, 0.999))

    label = torch.randn(BATCH, 36, H, W)
    image = torch.randn(BATCH, 3, H, W)

    def vgg_feats(x):
        feats, h, prev = [], x, 0
        for end in slices:
            h = vgg[prev:end](h)
            feats.append(h)
            prev = end
        return feats

    def step():
        lab = netE4label(label)
        feat = netE(image)
        fake = netG(torch.cat([lab, feat], 1))
        # G losses (reference weighting: lambda_feat=10, lambda_distortion=10)
        pred_fake = netD(torch.cat([label, fake], 1))
        loss_g_gan = sum(F.mse_loss(p[-1], torch.ones_like(p[-1]))
                         for p in pred_fake)
        pred_real = netD(torch.cat([label, image], 1))
        loss_fm = 0.0
        for pf, pr in zip(pred_fake, pred_real):
            for f, r in zip(pf[:-1], pr[:-1]):
                loss_fm = loss_fm + F.l1_loss(f, r.detach())
        fv, rv = vgg_feats(fake), vgg_feats(image)
        loss_vgg = sum(w * F.l1_loss(f, r.detach())
                       for w, f, r in zip(vgg_w, fv, rv))
        loss_dist = F.l1_loss(fake, image)
        loss_g = loss_g_gan + 10.0 * (loss_fm / (4 * 2) + loss_vgg + loss_dist)
        opt_g.zero_grad()
        loss_g.backward()
        opt_g.step()
        # D losses on pre-update G output (reference order: G step then D)
        pred_fake_d = netD(torch.cat([label, fake.detach()], 1))
        pred_real_d = netD(torch.cat([label, image], 1))
        loss_d = 0.5 * (
            sum(F.mse_loss(p[-1], torch.zeros_like(p[-1])) for p in pred_fake_d)
            + sum(F.mse_loss(p[-1], torch.ones_like(p[-1])) for p in pred_real_d)
        )
        opt_d.zero_grad()
        loss_d.backward()
        opt_d.step()
        return float(loss_g), float(loss_d)

    step()  # warmup (alloc paths)
    n = 2
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    measured = n * BATCH * H * W / 1e6 / dt
    threads = os.cpu_count() or 1
    normalized = measured * max(1.0, NOMINAL_CPU_THREADS / threads)
    rec = {
        "cpu_train_mps_measured": measured,
        "cpu_train_mps_normalized": normalized,
        "threads_measured": threads,
        "normalized_to_threads": NOMINAL_CPU_THREADS,
        "seconds_per_step": dt / n,
        "batch": BATCH,
        "hw": [H, W],
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
