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


def test_learned_codec_checkpoint_import_parity(tmp_path):
    """The fully-learned flagship (binarized label + visual encoders -> G)
    imported through the real reference-checkpoint flow
    (import_reference_checkpoint on net_G.pth / net_E.pth / net_E4label.pth)
    matches the from-spec torch stack on real bundled data."""
    import torch

    from jpdse_tpu.convert.torch_import import import_reference_checkpoint
    from jpdse_tpu.models.codec import SemanticCodec as SC

    cfg = Config()
    cfg.mode = "val"
    cfg.is_train = False
    cfg.data.dataset = "cityscapes"
    apply_dataset_defaults(cfg)
    cfg.data.root_dir = CITYSCAPES_ROOT
    cfg.data.num_workers = 0
    cfg.data.max_dataset_size = 1
    cfg.data.preprocess = PreprocessConfig("fixed", 256, 256, 2.0)
    m = cfg.model
    m.no_generator_binarization = True
    m.ngf = m.nef = m.ne4lf = 16
    m.n_downsample_global = m.n_downsample_E = m.n_downsample_E4label = 2
    m.n_blocks_global = 2
    m.label_encoder_out_channels = 12
    m.encoder_binarizer_out_channels = 16
    m.label_encoder_binarizer_out_channels = 16
    cfg.validate()
    sem_nc = cfg.data.semantic_nc

    golden = torch_ref.RefLearnedCodec(
        semantic_nc=sem_nc, label_out=12, feat_num=m.feat_num,
        ngf=16, nef=16, ne4lf=16, n_down=2, enc_bits=16, lab_bits=16,
        n_blocks=2, seed=0,
    )
    # write a reference-layout checkpoint directory and import it
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    torch.save(golden.netG.state_dict(), ckpt / "net_G.pth")
    torch.save(golden.netE.state_dict(), ckpt / "net_E.pth")
    torch.save(golden.netE4label.state_dict(), ckpt / "net_E4label.pth")

    codec = SC(cfg)
    loader = create_dataloader(cfg)
    batch = next(iter(loader))
    inputs = prepare_inputs(
        cfg,
        jnp.asarray(batch["label"]),
        jnp.asarray(batch["instance"]),
        jnp.asarray(batch["image"]),
    )
    import jax

    template = codec.init(
        {"params": jax.random.PRNGKey(0), "binarize": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        inputs, method=SC.decode,
    )["params"]
    params = import_reference_checkpoint(str(ckpt), cfg, template)

    fake_j, _ = codec.apply({"params": params}, inputs, method=SC.decode)
    fake_j = np.asarray(fake_j)[0]

    with torch.no_grad():
        oh = torch_ref.phase2_generator_input(
            np.asarray(batch["label"])[0], np.asarray(batch["instance"])[0],
            np.zeros_like(np.asarray(batch["image"])[0]), sem_nc,
        )[..., : sem_nc + 1]  # one-hot + edge only
        lab_t = torch.from_numpy(oh.transpose(2, 0, 1)[None])
        img_t = torch.from_numpy(
            np.asarray(batch["image"])[0].transpose(2, 0, 1)[None]
        )
        fake_t = golden(lab_t, img_t).numpy()[0].transpose(1, 2, 0)

    # binarized bottlenecks snap activations to {-1, 1}, so tiny float
    # differences cannot flip bits except exactly at 0 — expect tight parity
    np.testing.assert_allclose(fake_j, fake_t, atol=5e-4)
    mse_delta = abs(
        float(np.mean((fake_j - np.asarray(batch["image"])[0]) ** 2))
        - float(np.mean((fake_t - np.asarray(batch["image"])[0]) ** 2))
    )
    assert mse_delta < 1e-6
