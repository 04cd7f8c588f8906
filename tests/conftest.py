"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test process.
The harness may preset JAX_PLATFORMS to the real TPU platform — unit tests
must override it: they are numeric-correctness tests, and compiling on a
remote TPU makes them orders of magnitude slower.  Pallas kernels detect the
CPU platform and switch to interpret mode.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
