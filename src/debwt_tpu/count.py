"""On-device (k+1)-mer (edge) extraction and sorting.

Replaces the reference's Jellyfish subprocess + text-dump re-parse +
bucketed qsort (src/kmercounting.sh, src/mySort.c) with a single
device pass: windowed 2-bit key extraction (shifted slices — no
gathers) and one lexicographic sort of (hi, lo) uint32 key pairs.

Counting (run-length reduction to distinct m-mers) is deliberately
fused into classification: the sorted-with-duplicates edge array IS
the multiset the classifier needs, and XLA keeps it on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from debwt_tpu import ops


@functools.partial(jax.jit, static_argnames=("m", "n_edges"))
def extract_and_sort_edges(x2p: jnp.ndarray, dist: jnp.ndarray, m: int, n_edges: int):
    """Sorted edge keys for all separator-free m-windows.

    x2p: uint8[N + pad] 2-bit codes (separators stored as T).
    dist: int32[N] distance to the next separator at or after p.
    n_edges: static count = N - n_reads * m.

    Returns (hi, lo, pos): edge keys sorted lexicographically with the
    originating text position carried through.
    """
    N = dist.shape[0]
    hi, lo = ops.window_keys(x2p[: N + m - 1], m)
    valid = dist >= m
    (pos,) = jnp.nonzero(valid, size=n_edges)
    pos = pos.astype(jnp.int32)
    hi_s, lo_s, pos_s = ops.sort_by_key2(hi[pos], lo[pos], pos)
    return hi_s, lo_s, pos_s


@functools.partial(jax.jit, static_argnames=())
def distance_to_separator(sep: jnp.ndarray, n_positions_arr: jnp.ndarray):
    """dist[p] = sep[searchsorted(sep, p)] - p for p in [0, N).
    `n_positions_arr` is a dummy int32[N] iota carrier to keep the shape
    static under jit."""
    p = jnp.arange(n_positions_arr.shape[0], dtype=sep.dtype)
    nxt = jnp.searchsorted(sep, p, side="left")
    return (sep[nxt] - p).astype(jnp.int32)


def count_kmers(coll, m: int = 32):
    """Jellyfish-equivalent: exact (k+1)-mer counts of a read collection,
    computed on device (sort + run-length reduction). Returns
    (kmers uint64[:], counts int64[:]) sorted by k-mer value — the
    content of the reference's `bin/kmerInfo` after mySort
    (src/mySort.c:26-201), with no external process or text dump.
    """
    import numpy as np

    from debwt_tpu import constants as Kc
    from debwt_tpu import ops as _ops

    N = coll.bwt_len
    n = coll.n_reads
    x2p = np.concatenate(
        [coll.x2, np.full(Kc.TAIL_PAD, Kc.T, dtype=np.uint8)]
    )
    d_x2p = jnp.asarray(x2p)
    d_sep = jnp.asarray(coll.sep.astype(np.int32))
    dist = distance_to_separator(d_sep, jnp.zeros(N, jnp.int32))
    n_edges = N - n * m
    e_hi, e_lo, _pos = extract_and_sort_edges(d_x2p, dist, m, n_edges)
    b = _ops.run_boundaries(e_hi, e_lo)
    hi_h = np.asarray(e_hi).astype(np.uint64)
    lo_h = np.asarray(e_lo).astype(np.uint64)
    b_h = np.asarray(b)
    keys = ((hi_h << np.uint64(32)) | lo_h)[b_h]
    seg = np.cumsum(b_h) - 1
    counts = np.bincount(seg, minlength=int(seg[-1]) + 1 if seg.size else 0)
    return keys, counts.astype(np.int64)


def read_kmer_dump(path: str, m: int = 32):
    """Ingest an existing Jellyfish text dump (`kmer\\tcount` lines,
    the format the reference's mySort re-parses with fscanf,
    src/mySort.c:54) — interop for users who already ran counting.
    Returns (kmers uint64[:], counts int64[:]) sorted by k-mer value,
    i.e. exactly count_kmers' output format. The 'N'->G quirk of the
    reference's private trans table (src/mySort.c:33) is applied for
    byte-for-byte interop. Sized for convenience-scale dumps (a plain
    per-line parse); the primary path counts on device and never
    materializes a text dump.
    """
    import numpy as np

    raw = open(path, "rb").read()
    if not raw:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    lut = np.full(256, 255, np.uint8)
    for i, ch in enumerate(b"ACGT"):
        lut[ch] = i
        lut[ch + 32] = i
    lut[ord("N")] = 2   # the mySort 'N'->G quirk
    lut[ord("n")] = 2
    lines = raw.splitlines()
    keys = np.empty(len(lines), np.uint64)
    counts = np.empty(len(lines), np.int64)
    w = 0
    for ln in lines:
        if not ln:
            continue
        kmer, _, cnt = ln.partition(b"\t")
        if not cnt:
            kmer, _, cnt = ln.partition(b" ")
        if len(kmer) != m:
            raise ValueError(
                f"dump k-mer length {len(kmer)} != m={m} (line {w})"
            )
        codes = lut[np.frombuffer(kmer, np.uint8)]
        if (codes == 255).any():
            raise ValueError(f"invalid character in k-mer (line {w})")
        k = np.uint64(0)
        for c in codes:
            k = (k << np.uint64(2)) | np.uint64(c)
        keys[w] = k
        counts[w] = int(cnt)
        w += 1
    order = np.argsort(keys[:w], kind="stable")
    return keys[order], counts[order]
