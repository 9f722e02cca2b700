"""Jitted GAN training / eval steps.

Fuses the reference's per-step work (Pix2PixHDTrainer.step,
pix2pixHD_trainer.py:42-85 + Pix2PixHDModel.get_train_loss,
pix2pixHD_model.py:709-771) into one compiled function: generator forward,
three discriminator passes, two VGG passes, both losses, both Adam updates.

Update-ordering parity: the reference builds BOTH loss graphs from the
pre-update parameters, then steps G, then steps D — so the D update sees the
pre-update G's fake and its own pre-update weights. Here both gradients are
computed from `state.params_*` before either update is applied, which matches
exactly. The reference's `.detach()` calls (pix2pixHD_model.py:455, 753)
become `stop_gradient`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from jpdse_tpu.config import Config
from jpdse_tpu.models.codec import SemanticCodec, prepare_inputs
from jpdse_tpu.ops.metrics import denormalize_to_uint8
from jpdse_tpu.train.losses import (
    distortion_loss,
    feature_matching_loss,
    gan_loss,
    vgg_loss,
    vgg_loss_chunked,
)
from jpdse_tpu.train.state import GANTrainState, make_optimizers


def _inputs_from_batch(cfg: Config, batch: Dict[str, jax.Array]):
    return prepare_inputs(
        cfg,
        batch.get("label"),
        batch.get("instance"),
        batch["image"],
        batch.get("compressed"),
    )


def _d_concat(input_label: Optional[jax.Array], image: jax.Array) -> jax.Array:
    if input_label is None:
        return image
    return jnp.concatenate([input_label, image.astype(input_label.dtype)], axis=-1)


def make_train_step(
    cfg: Config,
    codec: SemanticCodec,
    disc,
    vgg_apply: Optional[Callable] = None,
    donate: bool = True,
    freeze_global: bool = False,
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    ``vgg_apply(x)->features`` closes over frozen VGG params (the reference's
    criterionVGG; networks.py:124-139). Pass None when loss.no_vgg_loss.

    ``freeze_global`` zeroes the global-generator trunk's gradients — the
    niter_fix_global phase when training local enhancers
    (pix2pixHD_model.py:251-268: only enhancer params enter optimizer_G until
    update_fixed_params re-adds the trunk).
    """
    L = cfg.loss
    opt_g, opt_d = make_optimizers(cfg)
    use_lsgan = not cfg.model.no_lsgan

    def _decode(params_g, mstate_g, inputs, rng):
        return codec.apply(
            {"params": params_g, **mstate_g},
            inputs,
            train=True,
            deterministic=False,
            rngs={"binarize": rng, "dropout": jax.random.fold_in(rng, 1)},
            method=SemanticCodec.decode,
            mutable=list(mstate_g) or False,
        )

    if cfg.optim.fast_train:
        # space-to-depth train decode (models/fast_train.py): raises with
        # the failed gate for ineligible configs. Eligible configs have no
        # mutable G state; binarizer rngs fold from the step rng (same
        # distribution as the flax per-module streams, different draws).
        from jpdse_tpu.models.fast_train import make_fast_train_decode

        _fast_decode = make_fast_train_decode(cfg, codec)

        def _decode(params_g, mstate_g, inputs, rng):  # noqa: F811
            del mstate_g
            return _fast_decode(params_g, inputs, rng, deterministic=False)

    def _disc_apply(params_d_and_mstate, x, keep):
        return disc.apply(params_d_and_mstate, x, keep)

    def _disc_apply_train(variables, x, keep):
        """Train-mode D read (batch statistics under --norm batch) whose
        stat mutation the caller discards."""
        mut = [k for k in variables if k != "params"]
        return disc.apply(variables, x, keep, train=True, mutable=mut)

    _vgg_apply = vgg_apply

    if cfg.optim.remat:
        # recompute forwards during backprop instead of saving activations —
        # the jax.checkpoint analog of torch checkpointing. The decode is
        # rematted at BLOCK granularity inside the generator/encoder modules
        # (codec.py passes cfg.optim.remat; see generator.py setup): one
        # whole-decode jax.checkpoint still held every internal residual
        # simultaneously during its backward (measured: 3x ~1GB f32 full-res
        # temps at batch 4). D feature pyramids (kept live by the
        # feature-matching loss) and VGG slices stay whole-function remats.
        if cfg.optim.remat_granularity == "decode":
            _decode = jax.checkpoint(_decode)
        _disc_apply = jax.checkpoint(_disc_apply, static_argnums=(2,))
        _disc_apply_train = jax.checkpoint(_disc_apply_train, static_argnums=(2,))
        if vgg_apply is not None:
            _vgg_apply = jax.checkpoint(vgg_apply)

    def g_loss_fn(params_g, params_d, mstate_g, mstate_d, inputs, rng):
        out = _decode(params_g, mstate_g, inputs, rng)
        if mstate_g:
            (fake, input_label), new_mstate_g = out
        else:
            (fake, input_label), new_mstate_g = out, mstate_g
        real = inputs["real_image"]
        keep = L.match_raw_feat
        # D(fake) WITH grad into G (pix2pixHD_model.py:733) and D(real) for
        # feature-matching targets (detached in the loss). The reference
        # evaluates these in TRAIN mode, so under --norm batch D normalizes
        # with batch statistics — replicate the stat SOURCE by passing
        # train=True and discarding the stat mutation. (Known minor delta:
        # torch also advances D's running averages on these forwards; here
        # only the D-update passes below advance them.)
        # pred_real exists only as feature-matching targets — skip the whole
        # D(real) forward when the FM loss is off (e.g. the phase-B
        # distortion-only recipes still running D for the GAN term)
        need_real = not L.no_gan_feat_loss
        if mstate_d:
            pred_fake, _ = _disc_apply_train(
                {"params": params_d, **mstate_d}, _d_concat(input_label, fake), keep
            )
            pred_real = (
                _disc_apply_train(
                    {"params": params_d, **mstate_d},
                    _d_concat(input_label, real), keep,
                )[0]
                if need_real
                else pred_fake
            )
        else:
            pred_fake = _disc_apply(
                {"params": params_d, **mstate_d}, _d_concat(input_label, fake), keep
            )
            pred_real = (
                _disc_apply(
                    {"params": params_d, **mstate_d},
                    _d_concat(input_label, real), keep,
                )
                if need_real
                else pred_fake
            )

        zero = jnp.asarray(0.0, jnp.float32)
        l_g_gan = gan_loss(pred_fake, True, use_lsgan) if not L.no_g_gan_loss else zero
        l_feat = (
            feature_matching_loss(pred_fake, pred_real, cfg.model.num_D)
            if not L.no_gan_feat_loss
            else zero
        )
        l_vgg = (
            vgg_loss_chunked(_vgg_apply, fake, real, cfg.optim.vgg_chunk)
            if (not L.no_vgg_loss and _vgg_apply is not None)
            else zero
        )
        l_dist = (
            distortion_loss(fake, real, L.distortion_loss_fn)
            if not L.no_distortion_loss
            else zero
        )
        return l_g_gan, l_feat, l_vgg, l_dist, fake, input_label, new_mstate_g

    def total_g(params_g, params_d, mstate_g, mstate_d, inputs, rng, lambda_w):
        l_g_gan, l_feat, l_vgg, l_dist, fake, input_label, new_mstate_g = g_loss_fn(
            params_g, params_d, mstate_g, mstate_d, inputs, rng
        )
        # weighting per pix2pixHD_trainer.py:48-56
        total = (
            l_g_gan
            + l_feat * L.lambda_feat
            + l_vgg * L.lambda_feat
            + l_dist * L.lambda_distortion * lambda_w
        )
        aux = {
            "G_GAN": l_g_gan,
            "G_GAN_Feat": l_feat,
            "G_VGG": l_vgg,
            "G_Distortion": l_dist,
            "fake": fake,
            "input_label": input_label,
            "mstate_g": new_mstate_g,
        }
        return total, aux

    def d_loss_fn(params_d, mstate_d, inputs, fake_concat, input_label):
        """fake_concat is the (possibly pool-replayed) detached
        label+fake pair (pix2pixHD_model.py:451-460)."""
        real = inputs["real_image"]
        label_sg = (
            jax.lax.stop_gradient(input_label) if input_label is not None else None
        )
        if mstate_d:
            pred_fake, ms1 = disc.apply(
                {"params": params_d, **mstate_d}, fake_concat,
                train=True, mutable=list(mstate_d),
            )
            pred_real, new_mstate_d = disc.apply(
                {"params": params_d, **ms1}, _d_concat(label_sg, real),
                train=True, mutable=list(ms1),
            )
        else:
            pred_fake = disc.apply({"params": params_d}, fake_concat)
            pred_real = disc.apply({"params": params_d}, _d_concat(label_sg, real))
            new_mstate_d = mstate_d
        l_fake = gan_loss(pred_fake, False, use_lsgan)
        l_real = gan_loss(pred_real, True, use_lsgan)
        return 0.5 * (l_fake + l_real), (l_real, l_fake, new_mstate_d)

    def step(state: GANTrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        inputs = _inputs_from_batch(cfg, batch)
        mstate_g = state.mstate_g if state.mstate_g is not None else {}
        mstate_d = state.mstate_d if state.mstate_d is not None else {}
        (loss_g, aux), grads_g = jax.value_and_grad(total_g, has_aux=True)(
            state.params_g,
            state.params_d,
            mstate_g,
            mstate_d,
            inputs,
            rng,
            state.lambda_distortion_weight,
        )
        new_mstate_g = aux["mstate_g"]
        new_mstate_d = mstate_d
        new_pool = state.pool
        if not L.no_d_gan_loss:
            label_sg = (
                jax.lax.stop_gradient(aux["input_label"])
                if aux["input_label"] is not None
                else None
            )
            fake_concat = _d_concat(label_sg, jax.lax.stop_gradient(aux["fake"]))
            if cfg.model.pool_size > 0:
                from jpdse_tpu.utils.image_pool import query as pool_query

                new_pool, fake_concat = pool_query(
                    state.pool, fake_concat, jax.random.fold_in(rng, 2)
                )
            (loss_d, (l_real, l_fake, new_mstate_d)), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_d, mstate_d, inputs, fake_concat, aux["input_label"])
        else:
            loss_d = jnp.asarray(0.0, jnp.float32)
            l_real = l_fake = loss_d
            grads_d = jax.tree.map(jnp.zeros_like, state.params_d)

        if freeze_global and "netG" in grads_g and "global" in grads_g["netG"]:
            grads_g = dict(grads_g)
            netg = dict(grads_g["netG"])
            netg["global"] = jax.tree.map(jnp.zeros_like, netg["global"])
            grads_g["netG"] = netg

        updates_g, new_os_g = opt_g.update(grads_g, state.opt_state_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, updates_g)
        updates_d, new_os_d = opt_d.update(grads_d, state.opt_state_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, updates_d)

        steps = state.steps_taken + 1
        lam = state.lambda_distortion_weight
        if L.anneal_lambda:
            lam = jnp.where(steps % L.anneal_interval == 0, lam * L.anneal_factor, lam)

        new_state = state.replace(
            params_g=new_params_g,
            params_d=new_params_d,
            opt_state_g=new_os_g,
            opt_state_d=new_os_d,
            steps_taken=steps,
            lambda_distortion_weight=lam,
            pool=new_pool,
            mstate_g=new_mstate_g,
            mstate_d=new_mstate_d,
        )
        metrics = {
            "G_GAN": aux["G_GAN"],
            "G_GAN_Feat": aux["G_GAN_Feat"],
            "G_VGG": aux["G_VGG"],
            "G_Distortion": aux["G_Distortion"],
            "D_real": l_real,
            "D_fake": l_fake,
            "loss_G": loss_g,
            "loss_D": loss_d,
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(cfg: Config, codec: SemanticCodec):
    """get_eval_loss (pix2pixHD_model.py:621-643): reconstruct, denormalize +
    uint8-quantize both images, distortion between them. The reference bounced
    GPU->CPU->GPU through tensor2im (:636-639); here the quantization is fused
    on-device."""
    mean = cfg.data.normalize_mean
    std = cfg.data.normalize_std
    kind = cfg.loss.distortion_loss_fn

    def step(params_g, mstate_g, batch):
        inputs = _inputs_from_batch(cfg, batch)
        fake, _ = codec.apply(
            {"params": params_g, **mstate_g}, inputs, method=SemanticCodec.decode
        )
        fake_u8 = denormalize_to_uint8(fake, mean, std)
        real_u8 = denormalize_to_uint8(inputs["real_image"], mean, std)
        return distortion_loss(fake_u8, real_u8, kind)

    return jax.jit(step)


def make_infer_fn(cfg: Config, codec: SemanticCodec):
    """get_img (pix2pixHD_model.py:463-465): deterministic reconstruction."""

    def infer(params_g, mstate_g, batch):
        inputs = _inputs_from_batch(cfg, batch)
        fake, _ = codec.apply(
            {"params": params_g, **mstate_g}, inputs, method=SemanticCodec.decode
        )
        return fake

    return jax.jit(infer)


def make_codes_fn(cfg: Config, codec: SemanticCodec):
    """get_code (pix2pixHD_model.py:495-505): deterministic binary codes."""

    def codes(params_g, mstate_g, batch):
        inputs = _inputs_from_batch(cfg, batch)
        return codec.apply(
            {"params": params_g, **mstate_g}, inputs, method=SemanticCodec.get_codes
        )

    return jax.jit(codes)


def make_shaped_codes_fn(cfg: Config, codec: SemanticCodec):
    """Binary codes in native (B, h, w, C) layout for entropy coding with
    per-channel contexts."""

    def codes(params_g, mstate_g, batch):
        inputs = _inputs_from_batch(cfg, batch)
        return codec.apply(
            {"params": params_g, **mstate_g},
            inputs,
            method=SemanticCodec.get_codes_shaped,
        )

    return jax.jit(codes)


def raw_side_inputs(side_batch, dtype=None):
    """The no-label branch of deploy-time side-info assembly: semantics ride
    in the codes; visuals — and, for an unbinarized encoder with
    inst_wise_pool, the instance ids its pooling needs
    (codec_io.side_requirements need_inst without need_label) — come from
    side info. prepare_inputs would one-hot the missing label, so the dict
    is assembled directly. SHARED by make_decode_from_codes_fn below and
    FastCodec.decode_from_codes_fn so the two .jpds decoders cannot drift."""
    cast = (lambda a: a.astype(dtype)) if dtype is not None else (lambda a: a)
    comp = side_batch.get("compressed")
    return {
        "input_label": None,
        "real_image": cast(side_batch["image"]),
        "instance_ids": side_batch.get("instance"),
        "masked_img": None,
        "compressed_img": cast(comp) if comp is not None else None,
    }


def make_decode_from_codes_fn(cfg: Config, codec: SemanticCodec):
    """Deploy-time decoder: (params, mstate, codes, side_batch) -> image,
    from the bitstream content alone (codec_io.py /
    SemanticCodec.decode_from_codes). ``side_batch`` is None for fully
    learned configs; for raw-semantics / base-codec configs it carries the
    .jpds side-info sections as a loader-shaped batch dict."""

    def side_inputs_from(side_batch):
        if side_batch is None:
            return None
        if side_batch.get("label") is None:
            return raw_side_inputs(side_batch)
        return _inputs_from_batch(cfg, side_batch)

    def fn(params_g, mstate_g, codes, side_batch):
        side_inputs = side_inputs_from(side_batch)
        return codec.apply(
            {"params": params_g, **mstate_g},
            codes,
            side_inputs,
            method=SemanticCodec.decode_from_codes,
        )

    return jax.jit(fn)


def make_rate_fn(cfg: Config, codec: SemanticCodec):
    """Batched on-device rate eval: (params, mstate, batch) ->
    (shannon_bpp, actual_bpp) scalars, already averaged over the batch and
    summed over codes (pix2pixHD_model.py:468-492). One two-scalar host fetch
    replaces the reference-style per-code-per-image Python loop (important
    over slow device->host links)."""
    from jpdse_tpu.ops.metrics import bernoulli_shannon_bpp

    def rate(params_g, mstate_g, batch):
        inputs = _inputs_from_batch(cfg, batch)
        codes = codec.apply(
            {"params": params_g, **mstate_g}, inputs, method=SemanticCodec.get_codes
        )
        num_pixels = batch["image"].shape[1] * batch["image"].shape[2]
        shannon = jnp.asarray(0.0, jnp.float32)
        actual = jnp.asarray(0.0, jnp.float32)
        for code in codes:
            s, a = jax.vmap(lambda c: bernoulli_shannon_bpp(c, num_pixels))(code)
            shannon = shannon + jnp.mean(s)
            actual = actual + jnp.mean(a)
        return shannon, actual

    return jax.jit(rate)
