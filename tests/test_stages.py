"""Per-stage device tests against the NumPy model trace and unit tests
of the device primitives."""

import jax.numpy as jnp
import numpy as np
import pytest

from debwt_tpu import count, ops
from debwt_tpu.model import build_model
from debwt_tpu.special import build_special, rank_suffixes
from debwt_tpu.types import SequenceCollection


@pytest.fixture
def coll():
    rng = np.random.default_rng(0)
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 160))))
        for _ in range(5)
    ]
    return SequenceCollection.from_reads(reads)


def test_searchsorted2_vs_numpy(rng):
    a64 = np.sort(rng.integers(0, 2**63, size=777).astype(np.uint64))
    q64 = np.concatenate(
        [
            rng.integers(0, 2**63, size=300).astype(np.uint64),
            a64[rng.integers(0, 777, 150)],
            np.array([0, a64[-1], np.iinfo(np.uint64).max], dtype=np.uint64),
        ]
    )
    ah = (a64 >> np.uint64(32)).astype(np.uint32)
    al = (a64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    qh = (q64 >> np.uint64(32)).astype(np.uint32)
    ql = (q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    for side in ("left", "right"):
        got = np.asarray(
            ops.searchsorted2(
                jnp.asarray(ah), jnp.asarray(al), jnp.asarray(qh),
                jnp.asarray(ql), side,
            )
        )
        assert (got == np.searchsorted(a64, q64, side=side)).all()


def test_window_keys_match_host(coll):
    from debwt_tpu.special import key_of_window

    k = 31
    N = coll.bwt_len
    x2p = np.concatenate([coll.x2, np.full(32, 3, dtype=np.uint8)])
    hi, lo = ops.window_keys(jnp.asarray(x2p[: N + k - 1]), k)
    key = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        lo
    ).astype(np.uint64)
    want = key_of_window(x2p, np.arange(N, dtype=np.int64), k)
    assert (key == want).all()


def test_distance_to_separator(coll):
    N = coll.bwt_len
    d = np.asarray(
        count.distance_to_separator(
            jnp.asarray(coll.sep.astype(np.int32)), jnp.zeros(N, jnp.int32)
        )
    )
    nxt = np.searchsorted(coll.sep, np.arange(N))
    assert (d == coll.sep[nxt] - np.arange(N)).all()


def test_edges_match_host(coll):
    m = 32
    N, n = coll.bwt_len, coll.n_reads
    x2p = np.concatenate([coll.x2, np.full(32, 3, dtype=np.uint8)])
    dist = count.distance_to_separator(
        jnp.asarray(coll.sep.astype(np.int32)), jnp.zeros(N, jnp.int32)
    )
    e_hi, e_lo, e_pos = count.extract_and_sort_edges(
        jnp.asarray(x2p), dist, m, N - n * m
    )
    e64 = (np.asarray(e_hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        e_lo
    ).astype(np.uint64)
    nxt = np.searchsorted(coll.sep, np.arange(N))
    disth = coll.sep[nxt] - np.arange(N)
    mainp = np.nonzero(disth >= m)[0]
    want = np.zeros(len(mainp), dtype=np.uint64)
    for i in range(m):
        want = (want << np.uint64(2)) | x2p[mainp + i].astype(np.uint64)
    assert (np.sort(want) == e64).all()
    assert (np.diff(e64.astype(object)) >= 0).all()


def test_sp_stream_matches_model(coll):
    """The engine's SP event stream (multi-out rows' positions and
    branch chars) equals the NumPy model's — through the production
    path (grouped tier internals share it)."""
    from debwt_tpu.grouped import GroupedConfig, build_bwt_grouped
    from debwt_tpu.types import PipelineConfig

    _, tr = build_model(coll, m=32, trace=True)
    stats = {}
    build_bwt_grouped(
        coll, PipelineConfig(m=32), GroupedConfig(cap=2048, chunk=1024),
        stats=stats,
    )
    assert stats["sp_len"] == tr.sp_positions.shape[0]


def test_rank_suffixes_true_order(rng):
    # rank_suffixes against a brute-force sort
    x = rng.integers(0, 4, size=500).astype(np.uint8)
    x[-1] = 5
    positions = rng.choice(500, size=60, replace=False).astype(np.int64)
    r = rank_suffixes(np.concatenate([x, np.full(32, 3, np.uint8)]), positions, 500)
    order = sorted(range(60), key=lambda i: list(x[positions[i]:]))
    want = np.empty(60, dtype=np.int64)
    want[order] = np.arange(60)
    assert (r == want).all()


def test_count_kmers_matches_counter(coll):
    from collections import Counter

    from debwt_tpu.count import count_kmers

    m = 32
    keys, counts = count_kmers(coll, m)
    # brute force over the reads
    want = Counter()
    x2 = coll.x2
    starts = np.concatenate([[0], coll.sep[:-1] + 1])
    for s, e in zip(starts, coll.sep):
        read = x2[s:e]
        for i in range(len(read) - m + 1):
            key = 0
            for c in read[i : i + m]:
                key = (key << 2) | int(c)
            want[key] += 1
    got = dict(zip((int(k) for k in keys), (int(c) for c in counts)))
    assert got == dict(want)


def test_read_kmer_dump_matches_device_counts(rng, tmp_path):
    """Jellyfish text-dump ingest (reference interop: the mySort
    fscanf format, src/mySort.c:54) reproduces the on-device counter's
    (keys, counts) exactly, including the 'N'->G quirk."""
    from debwt_tpu.count import count_kmers, read_kmer_dump
    from debwt_tpu.types import SequenceCollection

    reads = ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(5)]
    coll = SequenceCollection.from_reads(reads)
    m = 20
    keys, counts = count_kmers(coll, m=m)
    # render the reference-format dump (kmer\tcount)
    b = np.array(list("ACGT"))
    lines = []
    for k, c in zip(keys.tolist(), counts.tolist()):
        s = "".join(b[(k >> (2 * (m - 1 - j))) & 3] for j in range(m))
        lines.append(f"{s}\t{c}")
    rng2 = np.random.default_rng(1)
    rng2.shuffle(lines)          # dump order must not matter
    # exercise the N->G quirk on one line
    i = lines[0].index("G") if "G" in lines[0].split("\t")[0] else -1
    if i >= 0:
        lines[0] = lines[0][:i] + "N" + lines[0][i + 1:]
    p = tmp_path / "dump.txt"
    p.write_text("\n".join(lines) + "\n")
    keys2, counts2 = read_kmer_dump(str(p), m=m)
    assert (keys2 == keys).all()
    assert (counts2 == counts).all()
