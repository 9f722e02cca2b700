"""Full-model R-D parity CI test: the reference architecture built from spec
in torch (convert/torch_ref.py), imported through convert/torch_import.py,
must reconstruct within +-0.05 dB PSNR / +-0.001 MS-SSIM of the torch golden
on real bundled Cityscapes data through both stacks' full eval protocol
(reference test.py:114-125).

CI runs a mid-scale generator (all components, reduced width/depth/res) on
one image to stay within the 1-CPU budget; the committed full-scale
(ngf64 / 4 down / 9 blocks @ 1024x512, 30 images) evidence is produced by
tools/measure_rd.py and recorded in BASELINE.md. Set RD_PARITY_FULL=1 to run
the full-scale configuration here too.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from jpdse_tpu.config import Config, PreprocessConfig, apply_dataset_defaults
from jpdse_tpu.convert import torch_ref
from jpdse_tpu.convert.torch_import import convert_global_generator
from jpdse_tpu.data import create_dataloader
from jpdse_tpu.models.codec import SemanticCodec, prepare_inputs
from jpdse_tpu.ops.metrics import denormalize_to_uint8, ms_ssim, psnr
from jpdse_tpu.train.step import make_infer_fn

CITYSCAPES_ROOT = "/root/reference/datasets/cityscapes_test_CVPR20_1024"

FULL = os.environ.get("RD_PARITY_FULL") == "1"


@pytest.mark.skipif(
    not os.path.isdir(CITYSCAPES_ROOT), reason="bundled cityscapes set missing"
)
def test_full_model_rd_parity():
    ngf, n_down, n_blocks, crop = (64, 4, 9, 1024) if FULL else (16, 3, 4, 512)

    cfg = Config()
    cfg.mode = "val"
    cfg.is_train = False
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.data.root_dir = CITYSCAPES_ROOT
    cfg.data.num_workers = 0
    cfg.data.max_dataset_size = 30 if FULL else 1
    cfg.data.preprocess = PreprocessConfig("fixed", crop, crop, 2.0)
    cfg.data.normalize_std = (1.0, 1.0, 1.0)  # phase-2 recipe
    m = cfg.model
    m.no_label_encoding = True
    m.no_feat_encoding = True
    m.no_generator_binarization = True
    m.ngf, m.n_downsample_global, m.n_blocks_global = ngf, n_down, n_blocks
    cfg.codec.use_compressed = True
    cfg.codec.ext = "jpg"
    cfg.codec.quality = (50,)
    cfg.validate()
    sem_nc = cfg.data.semantic_nc

    gen_t = torch_ref.build_phase2_generator(
        sem_nc, m.input_nc, ngf, n_down, n_blocks, seed=0
    )
    sd = {k: v.numpy() for k, v in gen_t.state_dict().items()}
    params = {"netG": convert_global_generator(sd, n_down, n_blocks, binarize=False)}
    codec = SemanticCodec(cfg)
    infer = make_infer_fn(cfg, codec)
    mean, std = cfg.data.normalize_mean, cfg.data.normalize_std

    loader = create_dataloader(cfg)
    d_psnr, d_msssim = [], []
    for batch in loader:
        fake_j = np.asarray(infer(params, {}, {
            k: batch[k] for k in ("label", "instance", "image", "compressed")
        }))
        for j in range(fake_j.shape[0]):
            g_in = torch_ref.phase2_generator_input(
                np.asarray(batch["label"])[j],
                np.asarray(batch["instance"])[j],
                np.asarray(batch["compressed"])[j],
                sem_nc,
            )
            # independently re-derived preprocessing must agree bit-exactly
            jax_in = prepare_inputs(
                cfg,
                jnp.asarray(batch["label"][j][None]),
                jnp.asarray(batch["instance"][j][None]),
                jnp.asarray(batch["image"][j][None]),
                jnp.asarray(batch["compressed"][j][None]),
            )
            jax_concat = np.concatenate(
                [np.asarray(jax_in["input_label"][0]),
                 np.asarray(jax_in["compressed_img"][0])],
                axis=-1,
            )
            assert np.array_equal(g_in, jax_concat), "preprocessing mismatch"

            fake_t = torch_ref.torch_decode(gen_t, g_in)[0]
            real_u8 = np.asarray(
                denormalize_to_uint8(jnp.asarray(batch["image"][j]), mean, std)
            )
            fj_u8 = np.asarray(denormalize_to_uint8(jnp.asarray(fake_j[j]), mean, std))
            ft_u8 = np.asarray(denormalize_to_uint8(jnp.asarray(fake_t), mean, std))

            p_j = float(psnr(jnp.asarray(fj_u8), jnp.asarray(real_u8)))
            p_t = float(psnr(jnp.asarray(ft_u8), jnp.asarray(real_u8)))
            s_j = float(ms_ssim(jnp.asarray(fj_u8)[None], jnp.asarray(real_u8)[None]))
            s_t = float(ms_ssim(jnp.asarray(ft_u8)[None], jnp.asarray(real_u8)[None]))
            d_psnr.append(abs(p_j - p_t))
            d_msssim.append(abs(s_j - s_t))

    assert max(d_psnr) <= 0.05, f"PSNR diverged: {d_psnr}"
    assert max(d_msssim) <= 0.001, f"MS-SSIM diverged: {d_msssim}"
