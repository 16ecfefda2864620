"""Test harness config: simulate an 8-device TPU mesh on CPU.

Must run before any jax import (SURVEY.md §4: multi-host logic tested with
``--xla_force_host_platform_device_count=8`` mesh simulation).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The container's sitecustomize registers the axon TPU backend at interpreter
# start and programmatically sets jax_platforms="axon,cpu", which overrides the
# env var — force the config back to cpu before any jax computation runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite compiles ~100 CPU programs; caching
# them across runs cuts wall-clock several-fold on re-runs
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual devices for mesh tests"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
