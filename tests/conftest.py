"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; `xla_force_host_platform_device_count`
gives 8 fake devices so `jax.sharding` paths are exercised deterministically
(SURVEY.md §4).  Must run before the first `import jax`.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin pins jax_platforms at interpreter start (sitecustomize),
# so the env var alone is ignored — force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Persistent compilation cache: eigh/scan recompiles dominate test wall time.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
