"""Test env: CPU backend with 8 virtual devices so sharding/collective tests
run without a TPU pod (SURVEY.md §6 "Multi-device tests without a cluster").

This environment registers a remote-TPU JAX backend at interpreter startup
(sitecustomize) and forces `jax_platforms`; we override it back to CPU here —
tests must be hermetic and fast, benchmarks (bench.py) use the real chip.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
