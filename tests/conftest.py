"""Test configuration: run everything on a virtual 8-device CPU mesh.

This image pre-imports jax and registers the remote-TPU (axon) backend in
sitecustomize, so env vars alone are too late — the platform must be forced
via jax.config before the first computation.  Unit tests are numeric
correctness tests; compiling each one on the remote TPU would be orders of
magnitude slower.  Pallas kernels detect the CPU platform and switch to
interpret mode.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute full-resolution tests"
    )
