"""Test configuration.

Unit tests run on a virtual 8-device CPU mesh so that multi-chip
sharding logic is exercised without TPU hardware. The environment's
axon sitecustomize (PYTHONPATH=/root/.axon_site) force-registers the
TPU backend at interpreter start, ignoring JAX_PLATFORMS — so when we
detect it (and the caller didn't ask for TPU via DEBWT_TESTS_TPU=1) we
re-exec pytest once with a cleaned environment.
"""

import os
import sys

_WANT_TPU = os.environ.get("DEBWT_TESTS_TPU", "") == "1"

if not _WANT_TPU:
    if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the
    # TPU backend and sets jax_platforms="axon,cpu" at interpreter
    # start; flip the config to cpu-only before any device is used.
    import jax

    jax.config.update("jax_platforms", "cpu")

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
