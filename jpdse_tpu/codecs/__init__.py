from jpdse_tpu.codecs.bridge import (  # noqa: F401
    CodecUnavailable,
    available_codecs,
    encode_decode,
    batch_encode_decode,
    compress_for_model,
)
