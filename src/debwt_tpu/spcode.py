"""SP branch-code generation — on device.

The reference scans every text position with per-position binary
searches into the black/red tables, a LIFO queue, and per-red-entry
rwlocks (multiGenerateSP, src/generateSP.c:471-711). Here the whole
scan is data-parallel:

  * node lookup for every separator-free position: one vectorized
    binary search into the sorted node-key table (the black/red
    two-level hash becomes unnecessary — the searchsorted IS the
    lookup; a bucketed Pallas variant can cut the log factor later);
  * the SP stream is the compacted set of multi-out positions (plus
    special-branch positions), in text order — a mask + nonzero;
  * the queue discipline "each multi-in suffix drains at the first
    multi-out event at or after it" is literally
    searchsorted(sp_positions, p, 'left')    (:569-680).

SP chars are 6-letter: the text char at q+k, which is 4/'#' or 5/'$'
exactly when q is a read's tail window (distance == k) — the
reference's 'T'-plus-spSpecialIndex marker encoding (:630-642).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from debwt_tpu import ops

I32 = jnp.int32


@functools.partial(jax.jit, static_argnames=("k",))
def classify_positions(
    x2p, dist,
    node_hi, node_lo, multi_in, multi_out,
    spec_branch_mask,         # bool[N]: special-branch positions
    k: int,
):
    """Per-position flags. Returns (is_sp, is_blue, node_id) where
    node_id is valid only at separator-free ("main") positions."""
    N = dist.shape[0]
    win_hi, win_lo = ops.window_keys(x2p[: N + k - 1], k)
    is_main = dist >= k
    node_id = ops.searchsorted2(node_hi, node_lo, win_hi, win_lo, "left")
    node_id = jnp.minimum(node_id, node_hi.shape[0] - 1)
    is_sp = (is_main & multi_out[node_id]) | spec_branch_mask
    is_blue = is_main & multi_in[node_id]
    return is_sp, is_blue, node_id


@functools.partial(jax.jit, static_argnames=("k", "L", "B", "n_reads"))
def build_sp_and_blue(
    x2p, dist, is_sp, is_blue, node_id, sep,
    k: int, L: int, B: int, n_reads: int,
):
    """Compact the SP stream and the blue entries.

    Returns (sp6 uint8[L], blue_node int32[B], blue_spidx int32[B],
    blue_char6 uint8[B]).
    """
    N = dist.shape[0]
    (sp_pos,) = jnp.nonzero(is_sp, size=L, fill_value=N)
    sp_pos = sp_pos.astype(I32)
    # SP char: x6 at q + k (4/'#' or 5/'$' exactly when dist == k)
    at = jnp.minimum(sp_pos + k, x2p.shape[0] - 1)
    base = x2p[at].astype(jnp.uint8)
    is_sep_char = dist[jnp.minimum(sp_pos, N - 1)] == k
    is_dollar = is_sep_char & (at == sep[-1].astype(I32))
    sp6 = jnp.where(is_sep_char, jnp.where(is_dollar, 5, 4), base).astype(
        jnp.uint8
    )

    (blue_pos,) = jnp.nonzero(is_blue, size=B, fill_value=N)
    blue_pos = blue_pos.astype(I32)
    blue_node = node_id[jnp.minimum(blue_pos, N - 1)]
    blue_spidx = jnp.searchsorted(sp_pos, blue_pos, side="left").astype(I32)
    # BWT char: x6[p-1]; '$' for p == 0, '#' when p-1 is a separator
    prev = jnp.maximum(blue_pos - 1, 0)
    prev_is_sep = dist[prev] == 0
    pchar = x2p[prev].astype(jnp.uint8)
    blue_char6 = jnp.where(
        blue_pos == 0,
        jnp.uint8(5),
        jnp.where(prev_is_sep, jnp.uint8(4), pchar),
    )
    return sp_pos, sp6, blue_node, blue_spidx, blue_char6
