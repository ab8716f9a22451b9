"""Test configuration.

Logic tests run on CPU with 8 virtual devices so multi-chip sharding paths
are exercised without a TPU slice (SURVEY.md §4: multi-chip tests via
xla_force_host_platform_device_count).

NOTE: this environment force-registers a TPU PJRT plugin ("axon") via
sitecustomize and re-sets jax_platforms programmatically, so the env var
alone is not enough — we must update jax.config before any backend
initialisation.  Real-TPU runs happen in bench.py / __graft_entry__.py, not
under pytest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Pin the dispatch-RTT used by device routing (utils/hw.py) to the tunnel
# value: tests never pay a subprocess probe, and routing thresholds match
# the documented tunnel defaults unless a test overrides the env.
os.environ.setdefault("EDLIB_TPU_DISPATCH_RTT_MS", "25")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def random_seq(rng, length, sigma):
    return bytes(rng.randint(0, sigma, size=length, dtype=np.uint8))
