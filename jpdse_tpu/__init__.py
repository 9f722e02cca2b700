"""jpdse_tpu — TPU-native semantics-aware learned image compression framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of SenseBrain/JPD-SE
("High-Level Semantics for Joint Perception-Distortion Enhancement in Image
Compression", IEEE TIP 2022): a codec that augments any base codec (BPG / JPEG
/ WebP / JPEG2000 or a learned binarized bottleneck) with high-level semantics
(one-hot segmentation + instance boundary edges) and decodes through a
pix2pixHD-style conditional-GAN generator, trained in three phases to jointly
optimize rate-perception-distortion.

Design stance (TPU-first, not a port):
  * NHWC layouts, bf16-friendly compute, static shapes, jit-compiled steps.
  * Functional model API: ``encode`` / ``decode`` / ``train_step`` are pure
    functions over parameter PyTrees; stochastic ops take explicit PRNG keys.
  * Distribution via ``jax.sharding.Mesh`` + batch-axis data parallelism and
    spatial (halo-exchange) sharding — replacing the reference's explicit
    multi-GPU rejection (ctu/parsers/base_parser.py:236).
  * Host-side work (image decode, external base codecs, entropy coding) rides
    a threaded input pipeline plus native C++ helpers, never inside jit.
"""

__version__ = "0.1.0"

from jpdse_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    LossConfig,
    OptimConfig,
    CodecConfig,
    PreprocessConfig,
    derive_eval_config,
)
