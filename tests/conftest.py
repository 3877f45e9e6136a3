"""Test configuration: force an 8-device virtual CPU platform.

The judge/driver environment exposes one real TPU chip through the 'axon'
platform, and the axon sitecustomize pins JAX_PLATFORMS=axon, so env vars alone
cannot select CPU — `jax.config.update` after import is the reliable override.
Tests run on 8 virtual CPU devices so multi-chip sharding paths are exercised
without TPU hardware (the capability the reference lacks; SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
