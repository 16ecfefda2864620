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

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual devices for mesh tests"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
