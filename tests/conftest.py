"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test process.
Pallas kernels detect the CPU platform and switch to interpret mode.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
