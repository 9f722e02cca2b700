from jpdse_tpu.convert.torch_import import (  # noqa: F401
    import_reference_checkpoint,
    convert_global_generator,
    convert_encoder,
    convert_multiscale_discriminator,
)
