"""Blue-block ordering via SP suffix ranks — on device.

The reference sorts each case-3 block with a comparator-driven
quicksort whose comparisons walk the SP code 32 chars at a time with
separator collation (myQsort/cmpSP, src/sortBlue.c:109-280). The
comparator reduces to plain lexicographic order over the 6-letter SP
string (see model.py), so the entire per-block comparison sort is
replaced by ONE prefix-doubling rank computation over the SP string —
O(L log L) total, batched across every block at once — followed by a
single 2-key sort of the blue entries by (node, rank).

The SP string is zero-padded ('A', matching the reference's calloc'd
tail, src/generateSP.c:220-227); within-block comparisons are always
decided before the pad can matter (the '$' marker is unique).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from debwt_tpu import ops

I32 = jnp.int32


@functools.partial(jax.jit, static_argnames=())
def sp_suffix_ranks(sp6_ext: jnp.ndarray):
    """Ranks of all suffixes of sp6_ext (uint8[M], already padded) by
    prefix doubling. Returns int32[M]; equal suffixes (possible only in
    the pad region) receive arbitrary distinct ranks via index
    tie-break, which no within-block comparison depends on."""
    M = sp6_ext.shape[0]
    rank = sp6_ext.astype(I32)
    n_rounds = max(1, (M - 1).bit_length())
    idx = jnp.arange(M, dtype=I32)

    def round_fn(r, step):
        r2 = jnp.where(idx + step < M, r[jnp.minimum(idx + step, M - 1)], -1)
        r_s, r2_s, i_s = jax.lax.sort((r, r2, idx), num_keys=2, is_stable=True)
        new = jnp.ones(M, dtype=I32)
        new = new.at[1:].set(
            ((r_s[1:] != r_s[:-1]) | (r2_s[1:] != r2_s[:-1])).astype(I32)
        )
        ranks_sorted = jnp.cumsum(new) - 1
        return jnp.zeros(M, I32).at[i_s].set(ranks_sorted)

    step = 1
    for _ in range(n_rounds):
        rank = round_fn(rank, step)
        step <<= 1
    # final tie-break by index for exact distinctness
    r_s, i_s = jax.lax.sort((rank, idx), num_keys=2)
    out = jnp.zeros(M, I32).at[i_s].set(jnp.arange(M, dtype=I32))
    return out


@functools.partial(jax.jit, static_argnames=())
def order_blue(blue_node, blue_spidx, blue_char6, sp_rank, node_start):
    """Absolute BWT positions of the blue entries.

    Sort entries by (node, SP-suffix rank); the i-th entry of a node's
    run lands at node_start[node] + i."""
    B = blue_node.shape[0]
    r = sp_rank[blue_spidx]
    node_s, _, char_s = jax.lax.sort(
        (blue_node, r, blue_char6.astype(I32)), num_keys=2
    )
    idx = jnp.arange(B, dtype=I32)
    first = jnp.ones(B, dtype=bool)
    first = first.at[1:].set(node_s[1:] != node_s[:-1])
    seg_start = jax.lax.cummax(jnp.where(first, idx, -1))
    within = idx - seg_start
    pos = node_start[node_s] + within
    return pos, char_s.astype(jnp.uint8)
