from jpdse_tpu.ops.quantizers import (  # noqa: F401
    stochastic_sign_ste,
    deterministic_sign_ste,
    rounded_identity,
    Binarizer,
    S2HVQ,
    S2HVQV2,
)
from jpdse_tpu.ops.semantics import (  # noqa: F401
    one_hot_label,
    instance_edges,
    sem_mask,
    prepare_semantics,
)
from jpdse_tpu.ops.metrics import (  # noqa: F401
    psnr,
    ms_ssim,
    ssim,
    l1,
    mse,
    denormalize_to_uint8,
    bernoulli_shannon_bpp,
)
