"""Test configuration: force an 8-device virtual CPU platform.

The judge/driver environment exposes one real TPU chip through the 'axon'
platform, and the axon sitecustomize pins JAX_PLATFORMS=axon, so env vars alone
cannot select CPU — `jax.config.update` after import is the reliable override.
Tests run on 8 virtual CPU devices so multi-chip sharding paths are exercised
without TPU hardware (the capability the reference lacks; SURVEY.md §4).
"""

import os

# The collective timeouts match __graft_entry__.dryrun_multichip: on a host
# with fewer cores than virtual devices the per-device threads reach a
# collective rendezvous staggered by whole program-prefix executions, and
# XLA:CPU's default 40 s terminate then hangs/kills the process (observed:
# a full-suite futex deadlock on this 1-core container). With the timeouts
# raised, a loaded host degrades to slow instead of hung.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_collective_timeout_seconds=1200"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
