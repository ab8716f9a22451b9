"""Test configuration.

Logic tests run on CPU with 8 virtual devices so multi-chip sharding paths
are exercised without a TPU slice (SURVEY.md §4: multi-chip tests via
xla_force_host_platform_device_count).  Must be set before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def random_seq(rng, length, sigma):
    return bytes(rng.randint(0, sigma, size=length, dtype=np.uint8))
