"""Platform selection guard.

The environment's sitecustomize registers the axon TPU plugin and force-sets
``jax_platforms="axon,cpu"`` even when the caller exported
``JAX_PLATFORMS=cpu`` (e.g. virtual-device CPU dryruns and CI). Entry points
call :func:`honor_jax_platforms_env` before any backend initializes so the
explicit environment wins.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env():
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass
