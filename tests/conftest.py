"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-device sharding (pjit/shard_map over a Mesh) is exercised without TPU
hardware — the standard JAX trick (SURVEY.md §4).

NB: this image boots an `axon` TPU PJRT plugin via sitecustomize and forces
jax_platforms='axon,cpu', so plain env vars are not enough — we must override
the config knob itself before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Tests are compile-time-bound (100+ jitted train-step graphs); generated-code
# speed is irrelevant on the virtual CPU backend, so turn the optimizer off —
# cuts suite wall time >2x.
if "xla_backend_optimization_level" not in flags:
    flags += (
        " --xla_backend_optimization_level=0"
        " --xla_llvm_disable_expensive_passes=true"
    )
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_disable_most_optimizations", True)

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)

# Persistent compilation cache: the suite is compile-bound on this 1-core
# environment; cached executables make repeat runs ~10x faster.
_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
