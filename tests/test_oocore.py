"""Out-of-core tier tests: byte parity with forced chunking/spill,
bounded device arrays, and int64 coordinate arithmetic past 2^32.

The chunk/bucket caps are forced far below the input size so the
chunked external-sort machinery is genuinely exercised at test scale
(the reference's analogue is its 32 MiB temp-file tiering,
src/collect#$.h:12)."""

import numpy as np
import pytest

from debwt_tpu.golden import golden_bwt
from debwt_tpu.oocore import (
    OocConfig, blue_coordinates, build_bwt_ooc, sample_splitters,
)
from debwt_tpu.pipeline import build_bwt
from debwt_tpu.types import PipelineConfig, SequenceCollection

from conftest import random_reads


def _check(coll, config, ooc, stats=None):
    res = build_bwt_ooc(coll, config, ooc, stats=stats)
    want = golden_bwt(coll).bwt6
    assert (res.bwt6 == want).all()
    return res


@pytest.mark.parametrize("m", [12, 20, 32])
def test_ooc_matches_golden_forced_chunking(rng, m):
    reads = random_reads(rng, 12, lo=40, hi=200)
    coll = SequenceCollection.from_reads(reads)
    ooc = OocConfig(chunk=256, n_buckets=8)
    stats = {}
    _check(coll, PipelineConfig(m=m), ooc, stats)
    # chunking really happened and device arrays stayed bounded
    assert stats["n_chunks"] > 3
    assert stats["bucket_cap"] < coll.bwt_len


def test_ooc_matches_single_chip_pipeline(rng):
    reads = random_reads(rng, 8, lo=60, hi=300)
    coll = SequenceCollection.from_reads(reads)
    config = PipelineConfig(m=24)
    a = build_bwt_ooc(coll, config, OocConfig(chunk=512, n_buckets=4))
    b = build_bwt(coll, config)
    assert (a.bwt6 == b.bwt6).all()
    assert (a.sharp_pos == b.sharp_pos).all()
    assert a.dollar_pos == b.dollar_pos
    assert a.packed() == b.packed()


def test_ooc_spill_to_disk(rng, tmp_path):
    reads = random_reads(rng, 6, lo=40, hi=150)
    coll = SequenceCollection.from_reads(reads)
    ooc = OocConfig(chunk=128, n_buckets=8, spill_dir=str(tmp_path / "sp"))
    _check(coll, PipelineConfig(m=16), ooc)
    # spill files are deleted as consumed
    leftover = list((tmp_path / "sp").glob("bk*"))
    assert leftover == []


def test_ooc_repetitive_skew(rng):
    # heavy duplicate key mass: one repeated motif dominates
    motif = "ACGTACGTAAATTTCCCGGG" * 4
    reads = [motif * 3 + "".join(rng.choice(list("ACGT"), size=40))
             for _ in range(6)]
    coll = SequenceCollection.from_reads(reads)
    _check(coll, PipelineConfig(m=14), OocConfig(chunk=200, n_buckets=8))


def test_ooc_oversized_bucket_fallback(rng):
    """Pathological repeat (VERDICT r04 item 5): ~20% of the text is
    ONE repeated 31-mer, so a single node group dwarfs every bucket
    cap — unsplittable by any number of buckets since node groups must
    stay bucket-local. bucket_cap forces the oversized path (host
    full-key sort + giant-run reduction) at toy scale; output must be
    byte-identical to golden."""
    motif = "".join(rng.choice(list("ACGT"), size=31))
    parts = []
    for _ in range(40):
        parts.append(motif)
        parts.append("".join(rng.choice(list("ACGT"), size=124)))
    reads = [
        "".join(parts),
        "".join(parts[:20]) + "".join(rng.choice(list("ACGT"), size=50)),
    ]
    coll = SequenceCollection.from_reads(reads)
    stats = {}
    _check(
        coll, PipelineConfig(m=32),
        OocConfig(chunk=512, n_buckets=4, bucket_cap=512),
        stats=stats,
    )
    # and with a cap so small even the giant-run path must fire on the
    # hot node group (its occurrences exceed the cap)
    _check(
        coll, PipelineConfig(m=32),
        OocConfig(chunk=512, n_buckets=2, bucket_cap=32),
    )


def test_ooc_giant_run_multi_out_single_in(rng):
    """A giant run that is multi-out but single-in (case 2 at scale):
    the reduction path must emit the fill run, not blue slots."""
    # same 33-char context 'C' + motif ensures one predecessor base;
    # varying the char after the motif makes the node multi-out
    motif = "".join(rng.choice(list("ACGT"), size=32))
    parts = []
    for i in range(50):
        parts.append("C" + motif + "ACGT"[i % 4])
        parts.append("".join(rng.choice(list("ACGT"), size=37)))
    coll = SequenceCollection.from_reads(["".join(parts)])
    _check(
        coll, PipelineConfig(m=32),
        OocConfig(chunk=512, n_buckets=2, bucket_cap=24),
    )


def test_blue_coordinates_past_2_32():
    # bucket bases beyond 2^32: int64 coordinate arithmetic is exact
    BIG = np.int64(2**32 + 12345)
    b_base = np.array([BIG, BIG, BIG + 10, BIG, BIG + 10], dtype=np.int64)
    b_pos = np.array([100, 50, 7, 150, 3], dtype=np.int64)
    b_char = np.array([1, 2, 3, 0, 2], dtype=np.uint8)
    sp_pos = np.array([10, 60, 120], dtype=np.int64)
    rank = np.array([5, 1, 9], dtype=np.int64)
    coords, chars = blue_coordinates(b_base, b_pos, b_char, rank, sp_pos)
    # base BIG: pos 50 -> sp_idx 1 (rank 1); pos 100 -> sp_idx 2
    # (rank 9); pos 150 -> clipped sp_idx 2 (rank 9, pos tie-break).
    # order: (1,50)=2, (9,100)=1, (9,150)=0
    assert coords.dtype == np.int64
    got = dict(zip(coords.tolist(), chars.tolist()))
    assert got[int(BIG)] == 2        # pos 50
    assert got[int(BIG) + 1] == 1    # pos 100
    assert got[int(BIG) + 2] == 0    # pos 150
    assert got[int(BIG) + 10] == 2   # base BIG+10: pos 3 before pos 7
    assert got[int(BIG) + 11] == 3


def test_splitters_partition_monotone(rng):
    x2 = rng.integers(0, 4, size=5000).astype(np.uint8)
    sp = sample_splitters(x2, 8, 16)
    assert sp.shape == (7,)
    assert (np.diff(sp.astype(np.int64)) >= 0).all()


def test_api_routes_to_ooc(rng, monkeypatch):
    # force the router past the single-chip bound by shrinking it
    import debwt_tpu.api as api

    reads = random_reads(rng, 4, lo=40, hi=80)
    coll = SequenceCollection.from_reads(reads)
    monkeypatch.setattr(api, "_SINGLE_ROWS", 1)
    monkeypatch.setattr(api, "_fits_single", lambda c, m: False)
    import jax

    if len(jax.devices()) > 1:
        # with multiple devices the router prefers dist; force ooc
        monkeypatch.setattr(
            api, "_SINGLE_ROWS", 1, raising=True
        )
    # call the ooc tier directly through the router by pretending one
    # device is present
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [object()])
    res = api.build(coll, PipelineConfig(m=16))
    want = golden_bwt(coll).bwt6
    assert (res.bwt6 == want).all()


def test_checkpoint_resume_after_pass_a(rng, tmp_path, monkeypatch):
    """Interrupt after pass A; resume skips pass A entirely and the
    result is byte-identical."""
    import debwt_tpu.oocore as oc

    reads = random_reads(rng, 8, lo=50, hi=180)
    coll = SequenceCollection.from_reads(reads)
    config = PipelineConfig(m=20)
    ooc = OocConfig(chunk=256, n_buckets=8,
                    spill_dir=str(tmp_path / "ck"), checkpoint=True)

    # interrupt: first _classify_bucket call raises (pass A completed)
    real = oc._classify_bucket
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(oc, "_classify_bucket", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_bwt_ooc(coll, config, ooc)
    monkeypatch.setattr(oc, "_classify_bucket", real)

    # resume: pass A must not re-run (count _chunk_keys dispatches)
    a_calls = {"n": 0}
    real_keys = oc._chunk_keys

    def counting_keys(*a, **k):
        a_calls["n"] += 1
        return real_keys(*a, **k)

    monkeypatch.setattr(oc, "_chunk_keys", counting_keys)
    res = build_bwt_ooc(coll, config, ooc)
    assert a_calls["n"] == 0, "pass A re-ran despite checkpoint"
    want = golden_bwt(coll)
    assert (res.bwt6 == want.bwt6).all()
    assert res.dollar_pos == want.dollar_pos


def test_checkpoint_resume_mid_pass_b(rng, tmp_path, monkeypatch):
    """Crash midway through pass B; resume continues at the next
    bucket, byte-identical, without redoing completed buckets."""
    import debwt_tpu.oocore as oc

    reads = random_reads(rng, 10, lo=50, hi=180)
    coll = SequenceCollection.from_reads(reads)
    config = PipelineConfig(m=16)
    ooc = OocConfig(chunk=256, n_buckets=8,
                    spill_dir=str(tmp_path / "ck"), checkpoint=True)

    real = oc._classify_bucket
    calls = {"n": 0}

    def crash_on_4th(*a, **k):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated crash")
        return real(*a, **k)

    monkeypatch.setattr(oc, "_classify_bucket", crash_on_4th)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_bwt_ooc(coll, config, ooc)

    resumed = {"n": 0}

    def counting(*a, **k):
        resumed["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(oc, "_classify_bucket", counting)
    res = build_bwt_ooc(coll, config, ooc)
    # only the crashed bucket and the ones after it re-run
    assert resumed["n"] <= 8 - 3 + 1
    want = golden_bwt(coll)
    assert (res.bwt6 == want.bwt6).all()


def test_ooc_sharded_sp_rank(rng):
    """ooc x dist composition: a forced-tiny sp_cap pushes SP ranking
    onto the 8-device mesh (parallel/sprank); output stays
    byte-identical. This is the 30 Gbp pod configuration at test scale
    — no single-device SP ceiling remains."""
    import jax

    from debwt_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    # repeat-heavy input -> dense branch events -> long SP string
    motif = "ACGTTGCAACCGGTT" * 3
    reads = [motif * 4 + "".join(rng.choice(list("ACGT"), size=60))
             for _ in range(8)]
    coll = SequenceCollection.from_reads(reads)
    config = PipelineConfig(m=14)
    mesh = make_mesh(len(jax.devices()))
    stats = {}
    res = build_bwt_ooc(coll, config, OocConfig(chunk=256, n_buckets=8,
                                                sp_cap=16),
                        stats=stats, mesh=mesh)
    assert stats["sharded_rank"] is True
    assert stats["sp_len"] > 16
    want = golden_bwt(coll)
    assert (res.bwt6 == want.bwt6).all()
    assert (res.sharp_pos == want.sharp_pos).all()
    assert res.dollar_pos == want.dollar_pos


def test_ooc_sharded_rank_requires_mesh(rng):
    """Without a mesh, exceeding sp_cap is detected, never silent."""
    reads = random_reads(rng, 6, lo=60, hi=150)
    coll = SequenceCollection.from_reads(reads)
    with pytest.raises(NotImplementedError, match="no multi-device mesh"):
        build_bwt_ooc(coll, PipelineConfig(m=14),
                      OocConfig(chunk=256, n_buckets=4, sp_cap=1))


def test_native_binner_matches_numpy(rng, monkeypatch):
    """The C++ pass-A binner and the NumPy fallback must fill the
    bucket store identically (same rows, same within-bucket order) —
    pinned end-to-end by byte-identical output on a chunked run."""
    from debwt_tpu.io import native

    if not native.has_ooc_bin():
        pytest.skip("native binner not built")
    reads = random_reads(rng, 10, lo=50, hi=220)
    coll = SequenceCollection.from_reads(reads)
    config = PipelineConfig(m=18)
    ooc = OocConfig(chunk=256, n_buckets=8)
    a = build_bwt_ooc(coll, config, ooc)
    monkeypatch.setattr(native, "has_ooc_bin", lambda: False)
    b = build_bwt_ooc(coll, config, ooc)
    assert (a.bwt6 == b.bwt6).all()
    assert a.packed() == b.packed()
    want = golden_bwt(coll)
    assert (a.bwt6 == want.bwt6).all()


def test_checkpoint_done_runs_fresh(rng, tmp_path):
    """A completed manifest does not poison the next run."""
    reads = random_reads(rng, 5, lo=40, hi=120)
    coll = SequenceCollection.from_reads(reads)
    config = PipelineConfig(m=16)
    ooc = OocConfig(chunk=128, n_buckets=4,
                    spill_dir=str(tmp_path / "ck"), checkpoint=True)
    a = build_bwt_ooc(coll, config, ooc)
    b = build_bwt_ooc(coll, config, ooc)
    assert (a.bwt6 == b.bwt6).all()
