"""Distributed pipeline on the virtual 8-device CPU mesh vs golden."""

import numpy as np
import pytest

from debwt_tpu.golden import golden_bwt
from debwt_tpu.parallel import dist_build_bwt, make_mesh
from debwt_tpu.types import PipelineConfig, SequenceCollection


def _assert_equal(coll, mesh, config=None):
    g = golden_bwt(coll)
    r = dist_build_bwt(coll, config or PipelineConfig(), mesh)
    assert (g.bwt6 == r.bwt6).all()
    assert (g.sharp_pos == r.sharp_pos).all()
    assert g.dollar_pos == r.dollar_pos


@pytest.mark.parametrize("n_dev", [2, 3, 8])
def test_random_device_counts(n_dev):
    rng = np.random.default_rng(n_dev)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 300))))
        for _ in range(5)
    ]
    _assert_equal(SequenceCollection.from_reads(reads), make_mesh(n_dev))


def test_repeat_heavy_8dev():
    rng = np.random.default_rng(2)
    frags = ["".join(rng.choice(list("ACGT"), size=30)) for _ in range(4)]
    reads = [
        "".join(rng.choice(frags) for _ in range(5)) for _ in range(5)
    ]
    _assert_equal(SequenceCollection.from_reads(reads), make_mesh(8))


def test_skewed_keys_8dev():
    """Heavily skewed key distribution (poly-A runs + one dominant
    fragment): exercises the sampled splitter partitioning."""
    rng = np.random.default_rng(9)
    frag = "".join(rng.choice(list("ACGT"), size=40))
    reads = [
        "A" * 120 + frag + "A" * 60,
        frag + "A" * 80 + frag,
        "A" * 200,
        frag * 4,
        "".join(rng.choice(list("ACGT"), size=150)),
    ]
    _assert_equal(SequenceCollection.from_reads(reads), make_mesh(8))


@pytest.mark.parametrize("m", [12, 24, 32])
def test_k_sweep_4dev(m):
    rng = np.random.default_rng(m)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 200))))
        for _ in range(4)
    ]
    _assert_equal(
        SequenceCollection.from_reads(reads),
        make_mesh(4),
        PipelineConfig(m=m),
    )


def test_graft_entry_dryrun():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import jax

    fn, args = mod.entry()
    jax.jit(fn)(*args)
    mod.dryrun_multichip(8)


def test_pathological_single_bucket_8dev():
    """Skew stress: almost every key starts with a hot 8-char prefix
    (mutated poly-A). The 16-char splitter depth must both stay
    byte-correct AND split the hot 8-char bucket across devices — the
    per-device BWT segment-size spread is the balance witness (the old
    8-char splitters put ~everything on one chip here)."""
    rng = np.random.default_rng(7)
    # a dominant poly-A run with point mutations dense enough that
    # nearly every 16-char window holds one (gap ~10 < 16): the keys
    # are DIVERSE inside the hot 8-char bucket, so depth-16 splitters
    # can spread them. The unsplittable all-A node itself stays small
    # (an inherent limit shared with the reference's per-node blocks).
    polyA = np.zeros(30_000, dtype=np.uint8)
    mut = rng.choice(len(polyA) - 64, size=3000, replace=False) + 32
    polyA[mut] = rng.integers(1, 4, size=3000)
    reads = [
        "".join("ACGT"[c] for c in polyA),
        "".join(rng.choice(list("ACGT"), size=500)),
        "A" * 400,
        "".join(rng.choice(list("ACGT"), size=300)),
    ]
    coll = SequenceCollection.from_reads(reads)
    import debwt_tpu.parallel.dist as dist

    dbg = {}
    dist.DEBUG = dbg
    try:
        _assert_equal(coll, make_mesh(8))
    finally:
        dist.DEBUG = None
    # balance: per-device owned BWT segment sizes; with splittable key
    # mass no device may own more than ~3x its fair 1/8 share (the old
    # 8-char splitters put ~everything on one chip here)
    seg = dbg["cnt"].sum(axis=1)
    assert seg.max() <= 0.4 * seg.sum(), seg


def test_split_index_device_dtypes():
    """The 30 Gbp split-index discipline: device arrays hold only
    shard-local int32 positions/coordinates (no u32 global indices),
    so the old 2^32 collection ceiling is gone; only the per-shard
    bound remains."""
    import debwt_tpu.parallel.dist as dist

    rng = np.random.default_rng(3)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(50, 200))))
        for _ in range(6)
    ]
    coll = SequenceCollection.from_reads(reads)
    dbg = {}
    dist.DEBUG = dbg
    try:
        r = dist_build_bwt(coll, PipelineConfig(), make_mesh(8))
    finally:
        dist.DEBUG = None
    g = golden_bwt(coll)
    assert (g.bwt6 == r.bwt6).all()
    assert dbg["node_start"].dtype == np.int32
    assert dbg["b_sidx"].dtype == np.int32
    assert dbg["sharded_rank"]


def test_per_shard_guard_only():
    """A >2^32-char collection no longer trips a global ceiling; the
    remaining bound is per-shard (N/n < 2^31)."""

    class _Huge:
        bwt_len = 2**33
        n_reads = 4

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="per-shard"):
        dist_build_bwt(_Huge(), PipelineConfig(), make_mesh(2))
    # with enough shards the guard passes (per-shard 2^30 < 2^31);
    # compute the same bound arithmetic directly
    n = 16
    Ns = -(-(2**33) // n)
    assert Ns + 32 + 32 < 2**31
