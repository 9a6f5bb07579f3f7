"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (the driver's multichip
dry-run uses the same mechanism; see __graft_entry__.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize registers a TPU ("axon") PJRT backend and
# overrides jax_platforms; force CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
