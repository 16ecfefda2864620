"""Test harness config: simulate an 8-device TPU mesh on CPU.

Must run before any jax import (SURVEY.md §4: multi-host logic tested with
``--xla_force_host_platform_device_count=8`` mesh simulation).
"""

import os

# Force-assign (not setdefault): the container exports JAX_PLATFORMS=axon to
# point at the real TPU; unit tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
