"""Golden-model self-consistency tests (no JAX needed)."""

import numpy as np
import pytest

from debwt_tpu import constants as K
from debwt_tpu.golden import golden_bwt, lf_reconstruct, pack_2bit_u64, unpack_2bit_u64
from debwt_tpu.types import SequenceCollection


def test_sequence_collection_basics():
    reads = ["A" * 20 + "C" * 20, "G" * 40]
    coll = SequenceCollection.from_reads(reads)
    assert coll.bwt_len == 40 + 40 + 2
    assert coll.n_reads == 2
    assert list(coll.sep) == [40, 81]
    x6 = coll.x6
    assert x6[40] == K.SHARP and x6[81] == K.DOLLAR
    assert coll.x2[40] == K.T and coll.x2[81] == K.T


def test_min_read_length_enforced():
    with pytest.raises(ValueError):
        SequenceCollection.from_reads(["A" * 32])


def test_pack_roundtrip(rng):
    codes = rng.integers(0, 4, size=1001).astype(np.uint8)
    raw = pack_2bit_u64(codes)
    assert len(raw) == ((1001 + 31) // 32) * 8
    assert (unpack_2bit_u64(raw, 1001) == codes).all()


@pytest.mark.parametrize("n_reads,seed", [(1, 0), (3, 1), (8, 2)])
def test_lf_invertibility(n_reads, seed, make_reads):
    rng = np.random.default_rng(seed)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(33, 90))))
        for _ in range(n_reads)
    ]
    coll = SequenceCollection.from_reads(reads)
    g = golden_bwt(coll)
    assert (lf_reconstruct(g, coll.n_reads) == coll.x6).all()
    # per-char conservation
    assert (np.bincount(g.bwt6, minlength=6) == np.bincount(coll.x6, minlength=6)).all()
    assert g.sharp_pos.shape[0] == n_reads - 1


def test_duplicate_reads_lf():
    # identical reads stress the '#'-equal collation
    r = "ACGT" * 10 + "A"
    coll = SequenceCollection.from_reads([r, r, r])
    g = golden_bwt(coll)
    assert (lf_reconstruct(g, 3) == coll.x6).all()
