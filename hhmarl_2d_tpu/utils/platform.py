"""Platform selection honoring the user's JAX_PLATFORMS request.

The deployment image pins jax_platforms to the TPU tunnel at import time
via a site hook, which silently overrides ``JAX_PLATFORMS=cpu``; CLI tools
call ensure_platform() so an explicit user choice wins.
"""

from __future__ import annotations

import os


def ensure_platform():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    enable_compile_cache()


def enable_compile_cache():
    """Persistent on-disk compilation cache for every CLI driver.

    The train/eval programs are large (fused rollout + SGD); caching the
    compiled executables makes restarts and restore-chained curriculum
    stages start in seconds instead of minutes.  Opt out with
    HHMARL_NO_COMPILE_CACHE=1; relocate with JAX_COMPILATION_CACHE_DIR.
    """
    if os.environ.get("HHMARL_NO_COMPILE_CACHE"):
        return
    import jax
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/hhmarl_jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
