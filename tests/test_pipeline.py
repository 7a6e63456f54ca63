"""Device pipeline (JAX, CPU backend in tests) vs the golden spec."""

import numpy as np
import pytest

from debwt_tpu.golden import golden_bwt
from debwt_tpu.pipeline import build_bwt
from debwt_tpu.types import PipelineConfig, SequenceCollection


def _assert_equal(coll, config=None):
    g = golden_bwt(coll)
    r = build_bwt(coll, config or PipelineConfig(check=True))
    assert (g.bwt6 == r.bwt6).all()
    assert (g.sharp_pos == r.sharp_pos).all()
    assert g.dollar_pos == r.dollar_pos
    assert g.packed() == r.packed()


@pytest.mark.parametrize("seed,n_reads", [(0, 1), (1, 3), (2, 6), (3, 12)])
def test_random(seed, n_reads):
    rng = np.random.default_rng(seed)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 200))))
        for _ in range(n_reads)
    ]
    _assert_equal(SequenceCollection.from_reads(reads))


@pytest.mark.parametrize("m", [12, 16, 24, 31, 32])
def test_k_sweep(m):
    rng = np.random.default_rng(m)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 150))))
        for _ in range(4)
    ]
    _assert_equal(
        SequenceCollection.from_reads(reads), PipelineConfig(m=m, check=True)
    )


@pytest.mark.parametrize("seed", range(4))
def test_repeat_heavy(seed):
    rng = np.random.default_rng(seed)
    frags = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(15, 60))))
        for _ in range(5)
    ]
    reads = [
        "".join(rng.choice(frags) for _ in range(int(rng.integers(3, 7))))
        for _ in range(int(rng.integers(3, 8)))
    ]
    _assert_equal(SequenceCollection.from_reads(reads))


@pytest.mark.parametrize("m", [12, 20])
def test_homopolymer_small_m(m):
    """Small m on homopolymer-heavy reads drives L_cap/B_cap past R
    (every position is a branch event) — exercises the cap-padding in
    stage_finish's sort-based compaction."""
    rng = np.random.default_rng(m)
    reads = [
        "A" * 100,
        "A" * 50 + "C" + "A" * 33,
        "T" * 60 + "A" + "T" * 40,
        "".join(rng.choice(list("ACGT"), size=50)),
    ]
    _assert_equal(
        SequenceCollection.from_reads(reads), PipelineConfig(m=m, check=True)
    )


def test_low_complexity():
    reads = [
        "A" * 100 + "C" + "A" * 50,
        "AC" * 40 + "G",
        "A" * 40 + "C" + "A" * 40,
        "ACG" * 30,
    ]
    _assert_equal(SequenceCollection.from_reads(reads))


def test_duplicate_reads():
    rng = np.random.default_rng(7)
    base = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 90))))
        for _ in range(20)
    ]
    _assert_equal(SequenceCollection.from_reads(base + base[:10] + base[:5]))


@pytest.mark.slow
def test_100kbp():
    rng = np.random.default_rng(99)
    reads = ["".join(rng.choice(list("ACGT"), size=100_000))]
    _assert_equal(SequenceCollection.from_reads(reads))


def test_boundary_crossers():
    rng = np.random.default_rng(42)
    rand = lambda n: "".join(rng.choice(list("ACGT"), size=n))
    F = rand(45)
    U, V = rand(40), rand(40)
    R = rand(35)
    P = rand(35)
    W1 = P + "C" + rand(10) + R + "T" + rand(30)
    W2 = P + "G" + rand(10) + R + "A" + rand(30)
    filler = [R + rand(5) + R + rand(8) + R + rand(40) for _ in range(4)]
    _assert_equal(SequenceCollection.from_reads([U + F, W1, V + F, W2] + filler))
