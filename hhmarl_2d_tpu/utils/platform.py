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
