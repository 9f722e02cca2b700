from jpdse_tpu.ops.pallas.instance_norm import (  # noqa: F401
    fused_instance_norm,
    pallas_supported,
)
