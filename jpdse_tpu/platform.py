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
    try:
        import jax

        if want and jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass
    setup_compilation_cache()


def setup_compilation_cache():
    """Enable JAX's persistent compilation cache (measured working through
    the axon remote-compile relay, round 3: a fresh process re-loads a cached
    executable instead of re-compiling — full-size graphs cost 5-18 min per
    compile here, so repeated CLI invocations save that every time). Opt out
    with JPDSE_COMPILATION_CACHE=0."""
    if os.environ.get("JPDSE_COMPILATION_CACHE", "1") == "0":
        return
    path = os.environ.get(
        "JPDSE_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jpdse_jax_cache"),
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass


def init_distributed() -> bool:
    """Entry-point hook: initialize jax.distributed when a multi-process run
    is configured (JPDSE_COORDINATOR / JPDSE_NUM_PROCESSES / JPDSE_PROCESS_ID
    env vars, or TPU-pod auto-detection via JPDSE_MULTIHOST=1). No-op —
    returns False — for the common single-process case. Must run before any
    backend initializes, i.e. right after honor_jax_platforms_env()."""
    try:
        from jpdse_tpu.parallel import distributed

        if os.environ.get("JPDSE_MULTIHOST") == "1":
            # TPU pods: coordinator/process env is auto-detected by JAX
            return distributed.initialize(auto=True)
        return distributed.initialize()
    except Exception as e:
        print(f"warning: jax.distributed initialization failed ({e}); "
              "continuing single-process")
        return False
