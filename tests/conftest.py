"""Test configuration: force CPU with 8 virtual devices.

This is the JAX-native "fake cluster" (SURVEY.md §4d): multi-device sharding
paths are exercised without TPU hardware via
``--xla_force_host_platform_device_count``. Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/pairnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
