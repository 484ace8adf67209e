"""Test harness bootstrap.

Tests run on an 8-device virtual CPU mesh so multi-chip semantics are
exercised without TPU hardware (SURVEY.md section 4).  The container's
axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so the
platform is overridden through jax.config before any backend
initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
