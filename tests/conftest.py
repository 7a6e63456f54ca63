"""Test configuration.

Unit tests run on a virtual 8-device CPU mesh so that multi-chip
sharding logic is exercised without TPU hardware (the driver separately
dry-runs the multichip path; real-TPU runs set DEBWT_TESTS_TPU=1).
Must run before the first `import jax` anywhere in the test session.
"""

import os
import sys

if os.environ.get("DEBWT_TESTS_TPU", "") != "1":
    os.environ.setdefault(
        "XLA_FLAGS",
        "--xla_force_host_platform_device_count=8",
    )
    if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_reads(rng, n_reads, lo=33, hi=120):
    return [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(lo, hi))))
        for _ in range(n_reads)
    ]


@pytest.fixture
def make_reads(rng):
    def _make(n_reads, lo=33, hi=120):
        return random_reads(rng, n_reads, lo, hi)

    return _make
