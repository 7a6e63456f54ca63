"""Grouped device-resident tier: byte-parity vs the fused engine.

The fused engine is itself hash-pinned to the reference ELF
(tests/test_oracle.py), so equality against it at small scale pins the
grouped tier's semantics transitively. Tiny caps/chunks force real
multi-group, multi-chunk execution on small inputs.
"""

import numpy as np
import pytest

from debwt_tpu.grouped import GroupedConfig, build_bwt_grouped
from debwt_tpu.pipeline import build_bwt
from debwt_tpu.types import PipelineConfig, SequenceCollection


def _compare(coll, config, gcfg, mesh=None, stats=None):
    want = build_bwt(coll, config)
    got = build_bwt_grouped(coll, config, gcfg, stats=stats, mesh=mesh)
    assert (got.bwt6 == want.bwt6).all()
    assert (got.sharp_pos == want.sharp_pos).all()
    assert got.dollar_pos == want.dollar_pos
    assert got.packed() == want.packed()
    return got


def test_grouped_matches_engine_multigroup(make_reads):
    reads = make_reads(12, lo=40, hi=200)
    coll = SequenceCollection.from_reads(reads)
    stats = {}
    _compare(
        coll, PipelineConfig(m=32, check=True),
        GroupedConfig(cap=512, chunk=256), stats=stats,
    )
    assert stats["n_groups"] >= 2
    assert stats["n_chunks"] >= 2


def test_grouped_single_group(make_reads):
    reads = make_reads(4, lo=40, hi=90)
    coll = SequenceCollection.from_reads(reads)
    stats = {}
    _compare(
        coll, PipelineConfig(m=32),
        GroupedConfig(cap=100_000, chunk=1 << 12), stats=stats,
    )
    assert stats["n_groups"] == 1


@pytest.mark.parametrize("m", [12, 20, 32])
def test_grouped_small_m(make_reads, m):
    reads = make_reads(8, lo=34, hi=120)
    coll = SequenceCollection.from_reads(reads)
    _compare(
        coll, PipelineConfig(m=m), GroupedConfig(cap=1024, chunk=512)
    )


def test_grouped_branch_dense(rng):
    # near-identical copies with mutations: multi-in/multi-out density
    base = rng.choice(4, size=4000).astype(np.uint8)
    reads = []
    for g in range(4):
        gen = base.copy()
        if g:
            idx = rng.choice(len(gen), size=40, replace=False)
            gen[idx] = (gen[idx] + rng.integers(1, 4, size=40)) % 4
        reads.append(gen)
    coll = SequenceCollection.from_reads(reads)
    _compare(
        coll, PipelineConfig(m=24, check=True),
        GroupedConfig(cap=4096, chunk=2048),
    )


def test_grouped_skewed_text(rng):
    # one dominant repeated 40-mer: hot key prefixes stress the
    # splitter plan and the overflow retry
    motif = rng.choice(4, size=40).astype(np.uint8)
    parts = []
    for _ in range(60):
        parts.append(motif)
        parts.append(rng.choice(4, size=int(rng.integers(5, 30))).astype(np.uint8))
    read = np.concatenate(parts)
    coll = SequenceCollection.from_reads([read, read[:500]])
    _compare(
        coll, PipelineConfig(m=32), GroupedConfig(cap=2048, chunk=1024)
    )


def test_grouped_overflow_raises(rng):
    # cap far below N/G with a single group: unsplittable -> GroupOverflow
    from debwt_tpu.grouped import GroupOverflow

    read = np.zeros(3000, dtype=np.uint8)  # all-A: one hot prefix
    coll = SequenceCollection.from_reads([read])
    with pytest.raises(GroupOverflow):
        build_bwt_grouped(
            coll, PipelineConfig(m=32),
            GroupedConfig(cap=256, chunk=512),
        )


def test_api_falls_back_to_ooc_on_overflow(monkeypatch, rng):
    """A single node key exceeding the group cap must not abort
    api.build: it falls back to the out-of-core tier's giant-bucket
    path (byte-identical)."""
    from debwt_tpu import api

    read = np.zeros(3000, dtype=np.uint8)   # all-A: one hot node key
    coll = SequenceCollection.from_reads([read])
    monkeypatch.setenv("DEBWT_SINGLE_MAX_ROWS", "64")
    monkeypatch.setenv("DEBWT_GROUPED_CAP", "256")
    monkeypatch.setattr(api, "_SINGLE_ROWS", 2)   # dist gate off
    res = api.build(coll, PipelineConfig(m=32))
    from debwt_tpu.golden import golden_bwt

    want = golden_bwt(coll)
    assert (res.bwt6 == want.bwt6).all()
    assert res.dollar_pos == want.dollar_pos


def test_api_routes_grouped(monkeypatch, make_reads):
    from debwt_tpu import api

    reads = make_reads(6, lo=40, hi=120)
    coll = SequenceCollection.from_reads(reads)
    # force the single-chip bound below N so routing must pick a big
    # tier; single device in this process group? jax.devices() is the
    # 8-device CPU mesh, so dist would win — drop the bound AND the
    # device count via monkeypatching the dist gate
    monkeypatch.setenv("DEBWT_SINGLE_MAX_ROWS", "64")
    calls = {}

    def fake_grouped(coll_, config_):
        calls["grouped"] = True
        return build_bwt(coll_, config_)

    monkeypatch.setattr(
        "debwt_tpu.grouped.build_bwt_grouped", fake_grouped
    )
    monkeypatch.setattr(api, "_SINGLE_ROWS", 2)  # dist per-shard gate off
    res = api.build(coll, PipelineConfig(m=32))
    assert calls.get("grouped")
    want = build_bwt(coll, PipelineConfig(m=32))
    assert (res.bwt6 == want.bwt6).all()
