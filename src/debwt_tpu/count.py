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
