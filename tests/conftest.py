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

# Persistent compile cache: the unrolled coverage kernels take tens of
# seconds to compile; caching them across test runs cuts the suite from
# ~30min to minutes. Safe here because tests are CPU-only (enabling the
# cache against the tunneled TPU backend hangs it).
jax.config.update("jax_compilation_cache_dir", "/tmp/infidex_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
