"""Byte-parity against the checked-in reference ELF.

Three layers of claims, each pinned here:

1. `golden` (plain 6-letter lexicographic suffix sort) equals the
   reference output — the reference's comparators (cmp/cmpSP +
   minusDimer) implement exactly A<C<G<T<#<$ with '#'s comparing equal,
   and the branch encode is exact (model.py docstring).

2. `model` (the deBWT decomposition: node grouping + SP-code positional
   comparison) equals both, stage for stage.

3. Known reference UB, deliberately not emulated (see harness.py and
   model.py docstrings):
   - multi-thread SP stitch OOB when a thread segment has < 32 SP
     events (multiCatSP) -> oracle runs use -t 1;
   - cmpSP sentinel/heap reads past the '$' marker, reachable only
     when the whole SP stream has <= ~33 events (toy inputs) -> parity
     tests require L > 33.
"""

import numpy as np
import pytest

from debwt_tpu.golden import golden_bwt
from debwt_tpu.model import build_model
from debwt_tpu.types import SequenceCollection
from oracle.harness import reference_available, run_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference deBWT binary not available"
)


def _random_reads(seed, n_reads, lo=33, hi=200):
    rng = np.random.default_rng(seed)
    return [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(lo, hi))))
        for _ in range(n_reads)
    ]


def _repeatheavy_reads(seed):
    """Fragment-reuse collections: long shared repeats, shared heads and
    tails, duplicate reads."""
    rng = np.random.default_rng(seed)
    frags = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(20, 60))))
        for _ in range(5)
    ]
    reads = []
    for _ in range(int(rng.integers(4, 9))):
        r = "".join(rng.choice(frags) for _ in range(int(rng.integers(3, 8))))
        reads.append(r)
    if rng.random() < 0.5:
        reads.append(reads[0])  # exact duplicate read
    return reads


def _assert_parity(result, reads, tmp_path, m=32):
    obj, sharp, dollar = run_reference(reads, tmp_path, m=m)
    assert result.packed() == obj
    assert result.sharp_pos.shape == sharp.shape
    assert (result.sharp_pos == sharp).all()
    assert result.dollar_pos == dollar


# ---------------------------------------------------------------- golden


@pytest.mark.parametrize("seed,n_reads", [(0, 1), (1, 2), (2, 5), (3, 16)])
def test_golden_random(seed, n_reads, tmp_path):
    reads = _random_reads(seed, n_reads)
    coll = SequenceCollection.from_reads(reads)
    _assert_parity(golden_bwt(coll), reads, tmp_path)


@pytest.mark.parametrize("m", [12, 16, 24, 31])
def test_golden_k_sweep(m, tmp_path):
    reads = _random_reads(m, 4, lo=33, hi=150)
    coll = SequenceCollection.from_reads(reads)
    _assert_parity(golden_bwt(coll), reads, tmp_path, m=m)


def test_golden_shared_affixes(tmp_path):
    rng = np.random.default_rng(11)
    core = "".join(rng.choice(list("ACGT"), size=60))
    reads = ["AAA" + core, "CCC" + core, core + "TTT", core + "GGG", core]
    coll = SequenceCollection.from_reads(reads)
    _assert_parity(golden_bwt(coll), reads, tmp_path)


# ----------------------------------------------------------------- model


@pytest.mark.parametrize("seed,n_reads", [(0, 1), (1, 2), (2, 5), (3, 16)])
def test_model_random(seed, n_reads, tmp_path):
    reads = _random_reads(seed, n_reads)
    coll = SequenceCollection.from_reads(reads)
    _assert_parity(build_model(coll, m=32), reads, tmp_path)


@pytest.mark.parametrize("m", [12, 16, 24, 31])
def test_model_k_sweep(m, tmp_path):
    reads = _random_reads(m, 4, lo=33, hi=150)
    coll = SequenceCollection.from_reads(reads)
    _assert_parity(build_model(coll, m=m), reads, tmp_path, m=m)


@pytest.mark.parametrize("seed", range(8))
def test_model_repeat_heavy(seed, tmp_path):
    reads = _repeatheavy_reads(seed)
    coll = SequenceCollection.from_reads(reads)
    result, trace = build_model(coll, m=32, trace=True)
    if trace.sp_positions.shape[0] <= 33:
        pytest.skip("SP stream small enough to enter reference cmpSP UB")
    _assert_parity(result, reads, tmp_path)


def test_model_duplicate_reads(tmp_path):
    # enough reads that the SP stream exceeds the reference's UB regime
    rng = np.random.default_rng(7)
    base = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 90))))
        for _ in range(20)
    ]
    reads = base + base[:10] + base[:5]
    coll = SequenceCollection.from_reads(reads)
    result, trace = build_model(coll, m=32, trace=True)
    assert trace.sp_positions.shape[0] > 33
    _assert_parity(result, reads, tmp_path)


def test_model_low_complexity(tmp_path):
    reads = [
        "A" * 100 + "C" + "A" * 50,
        "AC" * 40 + "G",
        "A" * 40 + "C" + "A" * 40,
        "ACG" * 30,
        "".join(np.random.default_rng(5).choice(list("ACGT"), size=400)),
    ]
    coll = SequenceCollection.from_reads(reads)
    result, trace = build_model(coll, m=32, trace=True)
    if trace.sp_positions.shape[0] <= 33:
        pytest.skip("SP stream small enough to enter reference cmpSP UB")
    _assert_parity(result, reads, tmp_path)


# --------------------------------------------- branch-encode exactness


def test_model_equals_golden_on_boundary_crossers():
    """Suffix comparisons that cross read boundaries (shared read tails,
    near-identical continuations) are exactly repaired by the
    special-branch events and shared multi-out nodes — the SP encode is
    exact. Construct the hardest crossing shapes and check
    model == golden."""
    rng = np.random.default_rng(42)
    rand = lambda n: "".join(rng.choice(list("ACGT"), size=n))
    F = rand(45)           # shared read tail
    U, V = rand(40), rand(40)
    R = rand(35)           # repeated fragment -> branch events
    P = rand(35)           # shared continuation prefix > k chars
    W1 = P + "C" + rand(10) + R + "T" + rand(30)
    W2 = P + "G" + rand(10) + R + "A" + rand(30)
    filler = [R + rand(5) + R + rand(8) + R + rand(40) for _ in range(4)]
    reads = [U + F, W1, V + F, W2] + filler
    coll = SequenceCollection.from_reads(reads)
    g = golden_bwt(coll)
    m = build_model(coll, m=32)
    assert (g.bwt6 == m.bwt6).all()
    assert (g.sharp_pos == m.sharp_pos).all()
    assert g.dollar_pos == m.dollar_pos


@pytest.mark.parametrize("m", [12, 24, 32])
def test_device_pipeline_k_sweep(m, tmp_path):
    """The DEVICE pipeline (not just the NumPy model) byte-matches the
    reference binary across the -k range."""
    from debwt_tpu.pipeline import build_bwt
    from debwt_tpu.types import PipelineConfig

    rng = np.random.default_rng(m + 100)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(80, 300))))
        for _ in range(8)
    ]
    coll = SequenceCollection.from_reads(reads)
    _assert_parity(
        build_bwt(coll, PipelineConfig(m=m, check=True)),
        reads, tmp_path, m=m,
    )


def test_dist_pipeline_vs_reference(tmp_path):
    """The distributed pipeline byte-matches the reference binary."""
    import jax

    from debwt_tpu.parallel import dist_build_bwt, make_mesh
    from debwt_tpu.types import PipelineConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.default_rng(77)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(60, 250))))
        for _ in range(10)
    ]
    coll = SequenceCollection.from_reads(reads)
    _assert_parity(
        dist_build_bwt(coll, PipelineConfig(), make_mesh(8)),
        reads, tmp_path,
    )


def test_ooc_pipeline_vs_reference(tmp_path):
    """The out-of-core chunked tier byte-matches the reference binary
    with chunking and disk spill force-enabled."""
    from debwt_tpu.oocore import OocConfig, build_bwt_ooc
    from debwt_tpu.types import PipelineConfig

    rng = np.random.default_rng(91)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(60, 250))))
        for _ in range(10)
    ]
    coll = SequenceCollection.from_reads(reads)
    ooc = OocConfig(chunk=256, n_buckets=8,
                    spill_dir=str(tmp_path / "spill"))
    _assert_parity(
        build_bwt_ooc(coll, PipelineConfig(), ooc), reads, tmp_path,
    )
