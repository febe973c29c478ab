"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is tested without TPU hardware by forcing the host
platform to expose 8 devices (the v5e-8 stand-in), mirroring the reference's
CI strategy of running everything on commodity runners (SURVEY.md §4).

The environment may pre-register a TPU backend via sitecustomize, so both
the env vars AND jax.config are forced here before any test imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
