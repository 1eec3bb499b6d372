"""Test configuration: run everything on a virtual 8-device CPU mesh.

The standard JAX trick for testing pjit/shard_map without a pod slice
(SURVEY.md section 4d): force the host platform to expose 8 devices.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pin jax_platforms to the TPU tunnel ("axon") at import
# time regardless of JAX_PLATFORMS; override it explicitly so unit tests are
# fast and hermetic on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# float64 available for golden-reference geodesy tests; the simulator's own
# state arrays are explicitly float32 so engine behavior matches TPU.
jax.config.update("jax_enable_x64", True)
