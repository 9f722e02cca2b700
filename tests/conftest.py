"""Test harness: run everything on a virtual 8-device CPU mesh so the full
pjit pipeline executes in CI without TPUs (SURVEY.md §4 plan)."""

import os

# Must run before jax is imported anywhere. Set unconditionally: the ambient
# environment may point JAX at the real TPU, and tests need the virtual
# 8-device CPU backend (and CPU's strict f32 for golden-parity tolerances).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start; override it back to CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
