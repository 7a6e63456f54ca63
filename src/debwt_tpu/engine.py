"""Fused single-chip engine: the whole classification in ONE sort.

The reference (and the first-cut pipeline here) materializes an edge
table, aggregates it three ways, and joins the results back with
binary searches (src/mySort.c + src/getKmer.c + src/INandOut.c). On
TPU, sorts are bandwidth-cheap but random gathers are latency-bound,
so the profitable shape is the opposite: materialize ONE row per text
position and sort once.

Key observations that collapse the pipeline:

  * main positions (window separator-free) partition the text together
    with special positions, and each contributes exactly one BWT slot —
    so after sorting main rows by (window key, choice) merged with the
    T-filled special singletons, THE SORTED ROW INDEX IS THE BWT
    COORDINATE. No unit compaction, no repeat-fill.
  * every per-node fact is a segment reduction over that sorted array:
      cnt          = segment size
      multi-out    = >=2 distinct choice chars (choice = x6[p+k],
                     4/'#' or 5/'$' exactly for tail windows — which is
                     why tailSharp membership in the reference is the
                     same thing as a separator choice)
      multi-in     = any head row | >=2 distinct pred chars among
                     non-head rows (presence bits via segment_max —
                     the in-edge multiset IS the non-head rows)
  * case-2 assembly is an elementwise broadcast of the segment's pred;
  * spIdx(p) ("first multi-out event at or after p", the reference's
    LIFO queue discipline) = exclusive-cumsum of the SP-event mask.

Stage 1 (one jit) does everything up to the dynamic SP/blue counts;
stage 2 (one jit, sized by those counts) ranks the SP string by prefix
doubling and scatters the blue chars. Two device dispatches total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from debwt_tpu import ops

I32 = jnp.int32
U8 = jnp.uint8
KEY_MAX = jnp.uint32(0xFFFFFFFF)


def _dist_from_sep(is_sep, n):
    """dist[p] = (next separator position >= p) - p via reverse cummax
    — no searchsorted."""
    idx = jnp.arange(n, dtype=I32)
    sep_pos = jnp.where(is_sep, idx, n + 1)
    nxt = jax.lax.cummin(sep_pos, reverse=True)
    return nxt - idx


@functools.partial(jax.jit, static_argnames=("m", "N"))
def stage_graph(
    x2p,              # uint8[N + pad] 2-bit codes (separators as T)
    sep_pos,          # int32[n_cap] separator positions (pad: >= N)
    spec_hi, spec_lo,  # uint32[n_spec_cap] T-filled special keys, true
                       # order; padding rows carry KEY_MAX/KEY_MAX
    spec_char6,       # uint8[n_spec_cap]
    spec_rank_pos,    # int32[n_spec_cap] special positions, true order
    spec_branch_pos,  # int32[S_cap] special-branch positions (pad >= N)
    n_real,           # int32 scalar: true text length (N is the bucket)
    m: int,
    N: int,
):
    k = m - 1
    # masks built on device from the tiny position lists (saves two
    # N-sized host->device transfers)
    is_sep = jnp.zeros(N, bool).at[sep_pos].set(True, mode="drop")
    spec_branch_mask = jnp.zeros(N, bool).at[spec_branch_pos].set(
        True, mode="drop"
    )
    dist = _dist_from_sep(is_sep, N)
    whi, wlo = ops.window_keys(x2p[: N + k - 1], k)
    pos = jnp.arange(N, dtype=I32)
    is_main = (dist >= k) & (pos < n_real)
    is_head = (pos == 0) | jnp.concatenate(
        [jnp.zeros(1, bool), is_sep[:-1]]
    )
    # choice char at p+k (4/'#' or 5/'$' exactly when dist == k)
    nextc = x2p[pos + k].astype(U8)
    is_tailw = dist == k
    choice = jnp.where(
        is_tailw, jnp.where(pos + k == n_real - 1, jnp.uint8(5), jnp.uint8(4)),
        nextc,
    )
    # predecessor chars
    prev = x2p[jnp.maximum(pos - 1, 0)].astype(U8)
    bwt_char = jnp.where(
        pos == 0, jnp.uint8(5), jnp.where(is_head, jnp.uint8(4), prev)
    )

    # ---- the one sort: main rows + special singletons ----
    # third key packs (is_spec, choice) so ordering is
    # (key, is_spec, choice); payload packs (pred, head, bwt_char) into
    # one u8 — 5 sort operands total (compile + runtime win)
    n_spec = spec_hi.shape[0]
    R = N + n_spec
    r_hi = jnp.concatenate([jnp.where(is_main, whi, KEY_MAX), spec_hi])
    r_lo = jnp.concatenate([jnp.where(is_main, wlo, KEY_MAX), spec_lo])
    k3_main = jnp.where(is_main, choice, jnp.uint8(16 * 2))
    spec_pad = (spec_hi == KEY_MAX) & (spec_lo == KEY_MAX)
    k3_spec = jnp.where(spec_pad, jnp.uint8(32), jnp.uint8(16))
    r_k3 = jnp.concatenate([k3_main, k3_spec])
    pay_main = (
        jnp.where(is_head, jnp.uint8(7), prev)
        | (jnp.uint8(8) * (is_head & is_main).astype(U8))
        | (bwt_char << 4)
    )
    pay_spec = jnp.uint8(7) | (spec_char6 << 4)
    r_pay = jnp.concatenate([pay_main, pay_spec])
    r_pos = jnp.concatenate([pos, spec_rank_pos])
    r_hi, r_lo, r_k3, r_pay, r_pos = jax.lax.sort(
        (r_hi, r_lo, r_k3, r_pay, r_pos), num_keys=3, is_stable=True
    )
    r_spec = r_k3 >> 4
    r_choice = r_k3 & 15
    r_pred = r_pay & 7
    r_head = (r_pay & 8) != 0
    r_char = r_pay >> 4
    # main rows + spec rows == n_real exactly (they partition the
    # text); non-main and bucket-padding rows carry KEY_MAX and sort to
    # the tail, so valid sorted rows occupy [0, n_real) and the sorted
    # row index IS the BWT coordinate.
    row_valid = r_spec != 2

    # ---- segments: (key, is_spec) ----
    newseg = jnp.ones(R, bool)
    newseg = newseg.at[1:].set(
        (r_hi[1:] != r_hi[:-1])
        | (r_lo[1:] != r_lo[:-1])
        | (r_spec[1:] != r_spec[:-1])
    )
    seg = jnp.cumsum(newseg.astype(I32)) - 1
    # distinct choices per node segment (rows sorted by choice within)
    newpair = jnp.ones(R, bool)
    newpair = newpair.at[1:].set(newseg[1:] | (r_choice[1:] != r_choice[:-1]))
    n_choice = jax.ops.segment_sum(newpair.astype(I32), seg, num_segments=R)
    max_choice = jax.ops.segment_max(
        jnp.where(row_valid, r_choice, 0), seg, num_segments=R
    )
    # distinct preds among non-head rows: presence bits
    in_d = jnp.zeros(R, I32)
    for b in range(4):
        present = jax.ops.segment_max(
            ((r_pred == b) & row_valid).astype(I32), seg, num_segments=R
        )
        in_d = in_d + present
    head_present = jax.ops.segment_max(
        r_head.astype(I32), seg, num_segments=R
    )
    pred_single = jax.ops.segment_max(
        jnp.where(r_pred < 4, r_pred.astype(I32), -1), seg, num_segments=R
    )
    is_node_row = r_spec == 0
    multi_out_seg = (n_choice >= 2) | (max_choice >= 4)
    multi_in_seg = (in_d >= 2) | (head_present > 0)
    # gather per-row segment facts (indices monotone -> cheap gather)
    mo_row = multi_out_seg[seg] & is_node_row
    mi_row = multi_in_seg[seg] & is_node_row
    fill_row = jnp.where(
        r_spec == 1,
        r_char,
        jnp.where(
            mi_row, jnp.uint8(0), jnp.maximum(pred_single[seg], 0).astype(U8)
        ),
    )
    # segment start row == BWT block start (sorted index IS coordinate)
    idx = jnp.arange(R, dtype=I32)
    seg_start = jax.lax.cummax(jnp.where(newseg, idx, -1))

    # ---- per-position outputs (scatter by original position) ----
    mo_pos = jnp.zeros(N, bool).at[jnp.where(is_node_row, r_pos, N)].set(
        mo_row, mode="drop"
    )
    mi_pos = jnp.zeros(N, bool).at[jnp.where(is_node_row, r_pos, N)].set(
        mi_row, mode="drop"
    )
    base_pos = jnp.zeros(N, I32).at[jnp.where(is_node_row, r_pos, N)].set(
        seg_start, mode="drop"
    )
    is_sp = mo_pos | spec_branch_mask
    sp_idx_of = ops.exclusive_cumsum(is_sp.astype(I32))
    L = jnp.sum(is_sp.astype(I32))
    B = jnp.sum(mi_pos.astype(I32))

    # partial BWT: case-2 runs + specials in place; case-3 slots zeroed
    bwt6_partial = jnp.where(row_valid, fill_row, 0)[:N]
    return (
        bwt6_partial, dist, mi_pos, base_pos, is_sp, sp_idx_of,
        bwt_char, L, B,
    )


@functools.partial(
    jax.jit, static_argnames=("m", "N", "L_cap", "B_cap", "n_sharp_cap")
)
def stage_finish(
    x2p, dist, mi_pos, base_pos, is_sp, sp_idx_of, bwt_char,
    bwt6_partial, n_real,
    m: int, N: int, L_cap: int, B_cap: int, n_sharp_cap: int = 1,
):
    k = m - 1
    # SP string
    (sp_pos,) = jnp.nonzero(is_sp, size=L_cap, fill_value=N)
    sp_pos = sp_pos.astype(I32)
    at = jnp.minimum(sp_pos + k, x2p.shape[0] - 1)
    base_c = x2p[at].astype(U8)
    d_at = dist[jnp.minimum(sp_pos, N - 1)]
    is_sepc = d_at == k
    is_dollar = is_sepc & (sp_pos + k == n_real - 1)
    sp6 = jnp.where(is_sepc, jnp.where(is_dollar, 5, 4), base_c).astype(U8)
    sp6 = jnp.where(sp_pos < N, sp6, 0)
    # suffix ranks by prefix doubling over the zero-extended string
    sp6_ext = jnp.concatenate([sp6, jnp.zeros(L_cap, U8)])
    rank = _doubling_ranks(sp6_ext)[:L_cap]

    # blue entries
    (bp,) = jnp.nonzero(mi_pos, size=B_cap, fill_value=N)
    bp = bp.astype(I32)
    bval = bp < N
    bpc = jnp.minimum(bp, N - 1)
    b_base = jnp.where(bval, base_pos[bpc], N)
    b_rank = rank[jnp.minimum(sp_idx_of[bpc], L_cap - 1)]
    b_char = bwt_char[bpc]
    base_s, _, char_s = jax.lax.sort(
        (b_base, b_rank, b_char.astype(I32)), num_keys=2
    )
    idx = jnp.arange(B_cap, dtype=I32)
    first = jnp.ones(B_cap, bool).at[1:].set(base_s[1:] != base_s[:-1])
    within = idx - jax.lax.cummax(jnp.where(first, idx, -1))
    tgt = jnp.where(base_s < N, base_s + within, N)
    bwt6 = bwt6_partial.at[tgt].set(char_s.astype(U8), mode="drop")
    # zero the bucket-padding tail so packed words are clean
    bwt6 = jnp.where(jnp.arange(N, dtype=I32) < n_real, bwt6, 0)
    packed = ops.pack_2bit_words(jnp.where(bwt6 >= 4, jnp.uint8(3), bwt6))
    # sidecars + conservation counts on device (keeps d2h tiny)
    n_sharp = jnp.sum((bwt6 == 4).astype(I32))
    (sharp,) = jnp.nonzero(bwt6 == 4, size=n_sharp_cap, fill_value=N)
    (dollar,) = jnp.nonzero(bwt6 == 5, size=1, fill_value=N)
    counts6 = jnp.bincount(
        jnp.where(jnp.arange(N, dtype=I32) < n_real, bwt6.astype(I32), 6),
        length=7,
    )[:6]
    return bwt6, packed, sharp.astype(I32), dollar[0].astype(I32), n_sharp, counts6


def _doubling_ranks(sp6_ext):
    """Prefix-doubling suffix ranks; a while_loop so the body compiles
    once and iteration stops as soon as all ranks are distinct (a few
    rounds on genome-like SP strings)."""
    M = sp6_ext.shape[0]
    idx = jnp.arange(M, dtype=I32)

    def body(carry):
        rank, step, _done = carry
        r2 = jnp.where(idx + step < M, rank[jnp.minimum(idx + step, M - 1)], -1)
        r_s, r2_s, i_s = jax.lax.sort((rank, r2, idx), num_keys=2)
        new = jnp.ones(M, I32)
        new = new.at[1:].set(
            ((r_s[1:] != r_s[:-1]) | (r2_s[1:] != r2_s[:-1])).astype(I32)
        )
        csum = jnp.cumsum(new)
        rank = jnp.zeros(M, I32).at[i_s].set(csum - 1)
        all_distinct = csum[-1] == M
        return rank, step * 2, all_distinct

    def cond(carry):
        _rank, step, done = carry
        return (~done) & (step < 2 * M)

    rank0 = sp6_ext.astype(I32)
    rank, _, _ = jax.lax.while_loop(
        cond, body, (rank0, jnp.int32(1), jnp.bool_(False))
    )
    # final index tie-break for exact distinctness (pad-region ties)
    r_s, i_s = jax.lax.sort((rank, idx), num_keys=2)
    return jnp.zeros(M, I32).at[i_s].set(idx)
