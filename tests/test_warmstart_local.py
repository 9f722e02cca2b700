"""tools/warmstart_local_from_global.py: re-nesting a trained GlobalGenerator
checkpoint under netG/global so a LocalEnhancer config can --load_model it —
the pix2pixHD high-resolution scale-up recipe (reference networks.py:144-196
LocalEnhancer + base_parser.py --niter_fix_global knob surface).

Covers the hires runner's untested link (tools/run_flagship_hires.sh):
tiny global checkpoint -> tool subprocess -> partial restore into a
LocalEnhancer state -> trunk weights identical -> one frozen-global step.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.models import build_discriminator
from jpdse_tpu.models.codec import SemanticCodec, prepare_inputs
from jpdse_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from jpdse_tpu.train.state import create_train_state
from jpdse_tpu.train.step import make_train_step

from tests.test_codec_model import init_codec, tiny_batch, tiny_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP_FLAGS = dict(
    no_label_encoding=True, no_feat_encoding=True, no_generator_binarization=True
)


def _make_state(cfg, batch):
    codec, params_g, inputs = init_codec(cfg, batch)
    disc = build_discriminator(cfg)
    d_in = jnp.concatenate([inputs["input_label"], batch["image"]], axis=-1)
    params_d = disc.init(jax.random.PRNGKey(4), d_in)["params"]
    return codec, disc, create_train_state(cfg, params_g, params_d)


def test_warmstart_renest_restores_trunk_and_steps(tmp_path, rng):
    # 1) a "trained" tiny global checkpoint (ngf=8)
    g_cfg = tiny_cfg(**FLAGSHIP_FLAGS)
    batch = tiny_batch(rng)
    _, _, g_state = _make_state(g_cfg, batch)
    src = tmp_path / "global_ckpt"
    save_checkpoint(str(src), g_state, epoch=7)

    # 2) the tool, exactly as the hires runner invokes it
    dst = tmp_path / "warm_init"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "warmstart_local_from_global.py"),
         "--src", str(src), "--dst", str(dst)],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert (dst / "params").is_dir()

    # 3) restore into a LocalEnhancer template (ngf = src_ngf / 2)
    l_cfg = tiny_cfg(
        netG="local", ngf=4, n_local_enhancers=1, n_blocks_local=1,
        niter_fix_global=1, **FLAGSHIP_FLAGS,
    )
    l_cfg.loss.no_vgg_loss = True
    codec, disc, template = _make_state(l_cfg, batch)
    restored, meta = restore_checkpoint(str(dst), template)
    assert meta.get("warmstart_from") == str(src)

    src_trunk = dict(g_state.params_g["netG"])
    src_trunk.pop("tail")
    got_trunk = restored.params_g["netG"]["global"]
    assert "tail" not in got_trunk
    assert set(got_trunk) == set(src_trunk)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(src_trunk), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(got_trunk), key=lambda kv: str(kv[0])),
    ):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # enhancer stacks + discriminator stay fresh init
    for k in restored.params_g["netG"]:
        if k != "global":
            for a, b in zip(
                jax.tree.leaves(template.params_g["netG"][k]),
                jax.tree.leaves(restored.params_g["netG"][k]),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 4) one frozen-global train step runs finite on the restored state
    step = make_train_step(l_cfg, codec, disc, donate=False, freeze_global=True)
    new_state, metrics = step(restored, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss_G"]))
    # frozen trunk unchanged by the step
    for a, b in zip(
        jax.tree.leaves(restored.params_g["netG"]["global"]),
        jax.tree.leaves(new_state.params_g["netG"]["global"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warmstart_rejects_local_source(tmp_path, rng):
    l_cfg = tiny_cfg(
        netG="local", ngf=4, n_local_enhancers=1, n_blocks_local=1, **FLAGSHIP_FLAGS
    )
    l_cfg.loss.no_vgg_loss = True
    batch = tiny_batch(rng)
    _, _, state = _make_state(l_cfg, batch)
    src = tmp_path / "local_ckpt"
    save_checkpoint(str(src), state, epoch=1)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "warmstart_local_from_global.py"),
         "--src", str(src), "--dst", str(tmp_path / "x")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert out.returncode != 0
    assert "already a LocalEnhancer" in out.stderr + out.stdout
