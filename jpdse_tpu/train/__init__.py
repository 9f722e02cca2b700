from jpdse_tpu.train.losses import (  # noqa: F401
    gan_loss,
    feature_matching_loss,
    vgg_loss,
)
from jpdse_tpu.train.state import GANTrainState, create_train_state  # noqa: F401
from jpdse_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
from jpdse_tpu.train.schedule import ReduceLROnPlateau  # noqa: F401
