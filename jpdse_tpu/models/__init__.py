"""Model registry.

The reference resolves models by importlib name-mangling
(ctu/models/__init__.py:10-44); here it's an explicit factory dict — same
extension point (register your model class + config hook), no dynamic import
magic.
"""

from jpdse_tpu.models.codec import (  # noqa: F401
    SemanticCodec,
    build_discriminator,
    prepare_inputs,
)
from jpdse_tpu.models.discriminator import (  # noqa: F401
    MultiscaleDiscriminator,
    NLayerDiscriminator,
)
from jpdse_tpu.models.generator import (  # noqa: F401
    Encoder,
    GlobalGenerator,
    LocalEnhancer,
)
from jpdse_tpu.models.vgg import Vgg19Features, init_vgg19  # noqa: F401

MODEL_REGISTRY = {
    "pix2pixHD": SemanticCodec,
}


def create_model(cfg):
    name = cfg.model.model
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"model '{name}' not registered; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](cfg)
