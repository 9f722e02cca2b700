"""Train state: one PyTree holding both players' params + optimizer states.

Replaces the trainer-object state scattered across Pix2PixHDTrainer
(ctu/trainers/pix2pixHD_trainer.py:12-30, 119-176) and BaseTrainer
(base_trainer.py:10-12): steps_taken, best_val_loss, lambda annealing weight,
and the two Adam optimizers (created at pix2pixHD_model.py:248-280) live in a
single flax.struct dataclass so checkpointing is a single PyTree save and the
whole step jits.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from jpdse_tpu.config import Config


@struct.dataclass
class GANTrainState:
    params_g: Any  # SemanticCodec params (netG + netE + netE4label)
    params_d: Any  # MultiscaleDiscriminator params
    opt_state_g: Any
    opt_state_d: Any
    steps_taken: jax.Array  # int32 scalar
    lambda_distortion_weight: jax.Array  # float32 scalar (annealed)
    best_val_loss: jax.Array  # float32 scalar (1e12 init, base_trainer.py:12)
    pool: Any = None  # optional ImagePoolState (model.pool_size > 0)
    # non-param variable collections (e.g. BatchNorm running stats under
    # --norm batch); empty dicts for the default instance-norm configs
    mstate_g: Any = None
    mstate_d: Any = None


def make_optimizers(cfg: Config):
    """Two Adams with the reference hyperparameters (lr, beta1=0.5,
    beta2=0.999; pix2pixHD_model.py:275-279). learning_rate is injected as
    mutable optimizer state so the ReduceLROnPlateau host loop can scale it
    without recompiling."""
    o = cfg.optim

    def adam():
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=o.lr, b1=o.beta1, b2=o.beta2, eps=1e-8
        )

    return adam(), adam()


def create_train_state(
    cfg: Config, params_g, params_d, pool_image_shape=None,
    mstate_g=None, mstate_d=None,
) -> GANTrainState:
    opt_g, opt_d = make_optimizers(cfg)
    pool = None
    if cfg.model.pool_size > 0:
        if pool_image_shape is None:
            raise ValueError("pool_size > 0 requires pool_image_shape (H, W, C)")
        from jpdse_tpu.utils.image_pool import init_pool

        pool = init_pool(cfg.model.pool_size, tuple(pool_image_shape))
    return GANTrainState(
        params_g=params_g,
        params_d=params_d,
        opt_state_g=opt_g.init(params_g),
        opt_state_d=opt_d.init(params_d),
        steps_taken=jnp.asarray(0, jnp.int32),
        lambda_distortion_weight=jnp.asarray(1.0, jnp.float32),
        best_val_loss=jnp.asarray(1e12, jnp.float32),
        pool=pool,
        mstate_g=mstate_g or {},
        mstate_d=mstate_d or {},
    )


def get_lr(state: GANTrainState) -> float:
    return float(state.opt_state_g.hyperparams["learning_rate"])


def set_lr(state: GANTrainState, lr_g: float, lr_d: Optional[float] = None) -> GANTrainState:
    """Host-side LR override (the ReduceLROnPlateau hook)."""
    osg, osd = state.opt_state_g, state.opt_state_d
    osg.hyperparams["learning_rate"] = jnp.asarray(lr_g, jnp.float32)
    osd.hyperparams["learning_rate"] = jnp.asarray(lr_d if lr_d is not None else lr_g, jnp.float32)
    return state.replace(opt_state_g=osg, opt_state_d=osd)
