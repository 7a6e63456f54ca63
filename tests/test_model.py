"""Model self-tests (no reference binary needed): the exact-semantics
NumPy model agrees with the plain-lex golden model on typical inputs,
and its internal invariants hold."""

import numpy as np
import pytest

from debwt_tpu import constants as K
from debwt_tpu.golden import golden_bwt, lf_reconstruct
from debwt_tpu.model import build_model
from debwt_tpu.types import SequenceCollection


@pytest.mark.parametrize("seed,n_reads", [(0, 1), (1, 3), (2, 8), (5, 2)])
def test_model_equals_golden_on_random(seed, n_reads):
    rng = np.random.default_rng(seed)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(33, 250))))
        for _ in range(n_reads)
    ]
    coll = SequenceCollection.from_reads(reads)
    g = golden_bwt(coll)
    m = build_model(coll, m=32)
    assert (g.bwt6 == m.bwt6).all()
    assert (g.sharp_pos == m.sharp_pos).all()
    assert g.dollar_pos == m.dollar_pos


@pytest.mark.parametrize("m", [12, 20, 32])
def test_model_equals_golden_k_sweep(m):
    rng = np.random.default_rng(m)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(33, 120))))
        for _ in range(5)
    ]
    coll = SequenceCollection.from_reads(reads)
    assert (golden_bwt(coll).bwt6 == build_model(coll, m=m).bwt6).all()


def test_model_char_conservation():
    rng = np.random.default_rng(9)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(33, 100))))
        for _ in range(6)
    ]
    coll = SequenceCollection.from_reads(reads)
    m = build_model(coll, m=32)
    assert (
        np.bincount(m.bwt6, minlength=6) == np.bincount(coll.x6, minlength=6)
    ).all()


def test_model_trace_shapes():
    rng = np.random.default_rng(3)
    reads = [
        "".join(rng.choice(list("ACGT"), size=60)) for _ in range(3)
    ]
    coll = SequenceCollection.from_reads(reads)
    res, tr = build_model(coll, m=32, trace=True)
    k = 31
    n = coll.n_reads
    N = coll.bwt_len
    # every position is either main or special; specials = n*k
    assert (tr.dist >= 0).all()
    n_special = int((tr.dist <= k - 1).sum())
    assert n_special == n * k
    assert tr.node_cnt.sum() + n_special == N
    # SP events are sorted text positions, chars 4/5 exactly once per read
    assert (np.diff(tr.sp_positions) > 0).all()
    assert int((tr.sp6 >= 4).sum()) == n
    assert int((tr.sp6 == 5).sum()) == 1
