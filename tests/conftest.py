"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4).

This environment pre-registers an 'axon' TPU platform that wins over the
JAX_PLATFORMS env var, so the platform must be forced via jax.config before
any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# forced-CPU processes use their own compilation-cache partition (see
# sdn3d_tpu/core/cache.py) — cross-loading TPU-relay-written host
# executables triggers XLA machine-feature warnings
from sdn3d_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(subdir="cpu")
