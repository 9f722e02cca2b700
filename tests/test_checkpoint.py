import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from jpdse_tpu.train.state import create_train_state, get_lr, set_lr

from tests.test_codec_model import init_codec, tiny_batch, tiny_cfg


def _make_state(rng, cfg=None):
    import jax.numpy as jnp
    from jpdse_tpu.models import build_discriminator

    cfg = cfg or tiny_cfg(
        no_label_encoding=True, no_feat_encoding=True, no_generator_binarization=True
    )
    batch = tiny_batch(rng)
    codec, params_g, inputs = init_codec(cfg, batch)
    disc = build_discriminator(cfg)
    d_in = jnp.concatenate([inputs["input_label"], batch["image"]], axis=-1)
    params_d = disc.init(jax.random.PRNGKey(4), d_in)["params"]
    return cfg, create_train_state(cfg, params_g, params_d)


def test_save_restore_round_trip(tmp_path, rng):
    cfg, state = _make_state(rng)
    state = state.replace(
        steps_taken=jnp.asarray(123, jnp.int32),
        best_val_loss=jnp.asarray(7.5, jnp.float32),
    )
    save_checkpoint(str(tmp_path), state, epoch=4, extra_meta={"sched": {"lr": 1e-4}})
    _, fresh = _make_state(rng)
    restored, meta = restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.steps_taken) == 123
    assert float(restored.best_val_loss) == 7.5
    assert meta["epoch"] == 4 and meta["sched"]["lr"] == 1e-4
    for a, b in zip(jax.tree.leaves(state.params_g), jax.tree.leaves(restored.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_restore_across_phase_change(tmp_path, rng):
    """Phase-1 -> phase-2 style: architecture changes (extra input channels ->
    some shapes differ); matching leaves load, mismatched keep fresh init."""
    cfg1, state1 = _make_state(rng)
    save_checkpoint(str(tmp_path), state1, epoch=0)

    # a config with a different generator input width (no_feat: G loses the
    # image channels) -> head conv kernel shape changes, rest matches
    cfg2 = tiny_cfg(
        no_label_encoding=True,
        no_feat_encoding=True,
        no_feat=True,
        no_generator_binarization=True,
    )
    _, state2 = _make_state(rng, cfg2)
    restored, _ = restore_checkpoint(str(tmp_path), state2)
    # head kernel differs in shape -> stays fresh
    fresh_head = np.asarray(state2.params_g["netG"]["head"]["conv"]["conv"]["kernel"])
    rest_head = np.asarray(restored.params_g["netG"]["head"]["conv"]["conv"]["kernel"])
    np.testing.assert_array_equal(fresh_head, rest_head)
    # a deeper layer matches in shape -> loaded from phase 1
    loaded_res = np.asarray(restored.params_g["netG"]["res0"]["conv1"]["conv"]["kernel"])
    phase1_res = np.asarray(state1.params_g["netG"]["res0"]["conv1"]["conv"]["kernel"])
    np.testing.assert_array_equal(loaded_res, phase1_res)


def test_lr_set_get(rng):
    cfg, state = _make_state(rng)
    assert abs(get_lr(state) - cfg.optim.lr) < 1e-9
    state = set_lr(state, 1e-5)
    assert abs(get_lr(state) - 1e-5) < 1e-12


def test_save_restore_threaded_fetch(tmp_path, rng, monkeypatch):
    """JPDSE_CKPT_FETCH_THREADS>1 (thread-pooled D2H leaf fetches for the
    relay) writes an identical checkpoint to the serial default."""
    monkeypatch.setenv("JPDSE_CKPT_FETCH_THREADS", "4")
    cfg, state = _make_state(rng)
    save_checkpoint(str(tmp_path / "threaded"), state, epoch=2)
    monkeypatch.setenv("JPDSE_CKPT_FETCH_THREADS", "1")
    save_checkpoint(str(tmp_path / "serial"), state, epoch=2)
    _, fresh = _make_state(rng)
    a, _ = restore_checkpoint(str(tmp_path / "threaded"), fresh)
    _, fresh2 = _make_state(rng)
    b, _ = restore_checkpoint(str(tmp_path / "serial"), fresh2)
    for x, y in zip(jax.tree.leaves(a.params_g), jax.tree.leaves(b.params_g)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(
        jax.tree.leaves(a.opt_state_g), jax.tree.leaves(b.opt_state_g)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
