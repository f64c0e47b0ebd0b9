"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the standard JAX stand-in is
``--xla_force_host_platform_device_count`` (SURVEY.md §4). Env vars must be set
before jax initializes its backends, hence this conftest-level setup.
"""

import os

# Hard assignment, not setdefault: the machine-level axon sitecustomize sets
# JAX_PLATFORMS=axon at interpreter start (before conftest runs), which would
# silently route "CPU" tests through the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon register() can pin the platform programmatically; override it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.default_backend()}")
