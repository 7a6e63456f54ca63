"""Fused single-chip engine: the whole classification in ONE sort.

The reference (and the first-cut pipeline here) materializes an edge
table, aggregates it three ways, and joins the results back with
binary searches (src/mySort.c + src/getKmer.c + src/INandOut.c). On
TPU, sorts are bandwidth-cheap but random gathers are latency-bound
(measured on this backend: a full-size gather costs ~4x a one-operand
sort of the same array), so the profitable shape is the opposite:
materialize ONE row per text position and sort once.

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
                     non-head rows (presence bits via one segmented
                     suffix-OR — the in-edge multiset IS the non-head
                     rows)
  * case-2 assembly is an elementwise broadcast of the segment's pred;
  * spIdx(p) ("first multi-out event at or after p", the reference's
    LIFO queue discipline) = index in the sorted SP event list.

One code path serves every N < 2^29: the sort keys are the m-window
(node<<2 | choice) as a (hi, lo) uint32 pair, the third operand packs
(class, position) into one int32 —

    main row:    pos - 2^29          (negative; ascending position)
    special row: spec_j<<3 | char6   (in [0, 2^29))
    invalid row: 2^29 + row_index    (>= 2^29)

— so within equal keys main < special < invalid, and the per-row
facts (tail-window, head, pred) ride in a uint8 fourth operand that
the 3-key sort carries as payload. Separator choices ('#'/'$',
T-encoded in the text) collapse onto real-T rows in the key, which is
harmless because any tail window already forces multi-out via the
fact bit.

Stage 1 (one jit) does everything up to the dynamic SP/blue counts;
stage 2 (one jit, sized by those counts) ranks the SP string by prefix
tripling and scatters the blue chars. Two device dispatches total.

All full-length scans (separator distance, per-segment facts, fact
broadcast) run as single-HBM-pass Pallas kernels (kernels/seg_or.py)
on TPU — each XLA cummax/cummin they replace costs a full HBM pass
AND ~20-30 s of compile time on the axon service.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from debwt_tpu import ops
from debwt_tpu.kernels.seg_or import seg_scan_or, seg_suffix_or

I32 = jnp.int32
U8 = jnp.uint8
KEY_MAX = jnp.uint32(0xFFFFFFFF)
TAIL_PAD = 32     # == constants.TAIL_PAD (reference: src/collect#$.c:87-90)
BIG = 1 << 29     # class encoding split point (R < 2^29 rows)
POS_STOP = 1 << 29  # stop bit for position-valued OR-carry scans


def _dist_from_sep(is_sep, n):
    """dist[p] = (next separator position >= p) - p, as one segmented
    suffix OR-carry: separator rows carry their own position plus the
    stop bit; every row inherits the next separator's position.
    Rows past the last separator (bucket padding) come out negative —
    harmless, they are excluded by pos < n_real everywhere."""
    idx = jnp.arange(n, dtype=I32)
    words = jnp.where(is_sep, idx | POS_STOP, 0)
    words = words.at[-1].set(words[-1] | POS_STOP)
    nxt = seg_scan_or(words, stop_bit=POS_STOP) & (POS_STOP - 1)
    return nxt - idx


@functools.partial(jax.jit, static_argnames=("m", "N"))
def stage_graph(
    x2w,              # uint32[(N+pad)/16] packed 2-bit codes (seps as T)
    sep_pos,          # int32[n_cap] separator positions (pad: >= N)
    spec_hi, spec_lo,  # uint32[n_spec_cap] T-filled special keys, true
                       # order; padding rows carry KEY_MAX/KEY_MAX
    spec_char6,       # uint8[n_spec_cap]
    spec_branch_pos,  # int32[S_cap] special-branch positions (pad >= N)
    n_real,           # int32 scalar: true text length (N is the bucket)
    m: int,
    N: int,
):
    k = m - 1
    x2p = ops.unpack_2bit_words(x2w, N + TAIL_PAD)
    # masks built on device from the tiny position lists (saves two
    # N-sized host->device transfers)
    is_sep = jnp.zeros(N, bool).at[sep_pos].set(True, mode="drop")
    dist = _dist_from_sep(is_sep, N)
    pos = jnp.arange(N, dtype=I32)
    is_main = (dist >= k) & (pos < n_real)
    is_head = jnp.concatenate([jnp.ones(1, bool), is_sep[:-1]])
    is_tailw = dist == k
    # predecessor chars: a shift, never a gather
    prev = jnp.concatenate([jnp.zeros(1, U8), x2p[: N - 1]])
    bwt_char = jnp.where(
        pos == 0, jnp.uint8(5), jnp.where(is_head, jnp.uint8(4), prev)
    )
    n_spec = spec_hi.shape[0]
    R = N + n_spec
    assert R < BIG, R
    # spec_ord = spec_j<<3 | char must stay below BIG even when n_spec
    # approaches N (degenerate read length ~= k)
    assert 8 * n_spec < BIG, n_spec
    spec_pad = (spec_hi == KEY_MAX) & (spec_lo == KEY_MAX)
    spec_j = jnp.arange(n_spec, dtype=I32)
    predf = jnp.where(is_head, jnp.uint8(7), prev)

    # ---- the ONE sort: m-window 64-bit keys, class+pos in ord ----
    # The m-window key IS (node key << 2 | next text char), so the
    # sort groups by node AND by real choice char for free; the
    # separator choices ('#'/'$', T-encoded in the text) collapse
    # onto real-T rows, which is harmless because any tail window
    # already forces multi-out (the f8 tail bit).
    whi, wlo = ops.window_keys(x2p[: N + m - 1], m)
    s_hi2 = (spec_hi << 2) | (spec_lo >> 30)   # spec62<<2 | T-fill
    s_lo2 = (spec_lo << 2) | 3
    r_hi = jnp.concatenate([jnp.where(is_main, whi, KEY_MAX), s_hi2])
    r_lo = jnp.concatenate([jnp.where(is_main, wlo, KEY_MAX), s_lo2])
    ord_main = jnp.where(is_main, pos - BIG, BIG + pos)
    ord_spec = jnp.where(
        spec_pad, BIG + N + spec_j, (spec_j << 3) | spec_char6.astype(I32)
    )
    r_ord = jnp.concatenate([ord_main, ord_spec])
    f8_main = (
        (is_tailw.astype(U8) << 4) | (is_head.astype(U8) << 3) | predf
    )
    f8 = jnp.concatenate(
        [jnp.where(is_main, f8_main, jnp.uint8(0)), jnp.zeros(n_spec, U8)]
    )
    r_hi, r_lo, r_ord, r_f8 = ops.msort((r_hi, r_lo, r_ord, f8), num_keys=3, site="graph")
    is_node_row = r_ord < 0
    is_spec1 = (r_ord >= 0) & (r_ord < BIG)
    row_valid = r_ord < BIG
    r_pred = (r_f8 & 7).astype(U8)
    r_head = (r_f8 & 8) != 0
    r_tailw = (r_f8 & 16) != 0
    spec_char_row = (r_ord & 7).astype(U8)     # spec rows only
    r_pos = r_ord + BIG                        # node rows only
    node_lo = r_lo >> 2
    cls = jnp.where(is_node_row, 0, jnp.where(is_spec1, 1, 2))
    newseg = jnp.ones(R, bool)
    newseg = newseg.at[1:].set(
        (r_hi[1:] != r_hi[:-1])
        | (node_lo[1:] != node_lo[:-1])
        | (cls[1:] != cls[:-1])
    )
    choice_chg = jnp.zeros(R, bool).at[1:].set(
        (r_lo[1:] & 3) != (r_lo[:-1] & 3)
    )
    mo_ind = ((choice_chg & ~newseg) | r_tailw) & is_node_row

    # main rows + spec rows == n_real exactly (they partition the
    # text); non-main and bucket-padding rows carry KEY_MAX and sort to
    # the tail, so valid sorted rows occupy [0, n_real) and the sorted
    # row index IS the BWT coordinate.
    # All per-segment facts are PRESENCE tests evaluated at the
    # segment-start rows: "does pred class c / a head row / a
    # multi-out indicator occur anywhere in my segment?". All six pack
    # into one bit-word per row and ONE segmented suffix-OR.
    pred_bit = jax.lax.shift_left(jnp.int32(1), r_pred.astype(I32)) & 15
    bits = (
        jnp.where(is_node_row, pred_bit, 0)
        | jnp.where(r_head & is_node_row, 16, 0)
        | jnp.where(mo_ind, 32, 0)
    )
    stop = jnp.concatenate([newseg[1:], jnp.ones(1, bool)])
    orb = seg_suffix_or(bits | (stop.astype(I32) << 6))
    p1 = (orb >> 1) & 1
    p2 = (orb >> 2) & 1
    p3 = (orb >> 3) & 1
    in_d = (orb & 1) + p1 + p2 + p3
    pred_sum = p1 + 2 * p2 + 3 * p3
    mo_seg = (orb & 32) != 0
    mi_seg = (in_d >= 2) | ((orb & 16) != 0)
    # only meaningful when in_d == 1; clamp to its 2-bit field (the sum
    # reaches 6 for multi-pred segments and would bleed into idx bits)
    pred_single = jnp.where(in_d == 1, pred_sum, 0)
    # two prefix OR-carry scans broadcast (seg start row index, 4-bit
    # facts) from the start row to the whole segment; start rows carry
    # the stop bit, non-start rows carry 0 bits, so the OR-carry IS
    # the broadcast. Row indices fit below POS_STOP for all R < 2^29.
    idx = jnp.arange(R, dtype=I32)
    facts = (
        (pred_single << 2) | (mi_seg.astype(I32) << 1) | mo_seg.astype(I32)
    )
    stop_w = newseg.astype(I32) << 29
    seg_start = seg_scan_or(
        jnp.where(newseg, idx, 0) | stop_w, stop_bit=POS_STOP, prefix=True
    ) & (POS_STOP - 1)
    f_row = seg_scan_or(
        jnp.where(newseg, facts, 0) | stop_w, stop_bit=POS_STOP, prefix=True
    ) & 15
    mo_row = ((f_row & 1) != 0) & is_node_row
    mi_row = ((f_row & 2) != 0) & is_node_row
    pred_single_row = ((f_row >> 2) & 3).astype(U8)
    # SP event keys: pos<<3 | char6, one uint32 per multi-out row. The
    # SP char is the base k ahead (src/generateSP.c:626-651) — which
    # IS the m-window's last char (r_lo & 3), or '#'/'$' for tail
    # windows — so it costs ZERO gathers here, where stage_finish used
    # to gather x2p/dist at L_cap positions. Positions are unique, so
    # sorting these keys yields the SP stream in text order with the
    # char riding along. SENT = 0xFFFFFFFF sorts pads to the tail and
    # decodes to pos 2^29-1 >= any bucket cap.
    is_dollar_row = r_tailw & (r_pos + (m - 1) == n_real - 1)
    sp6_row = jnp.where(
        r_tailw,
        jnp.where(is_dollar_row, jnp.uint32(5), jnp.uint32(4)),
        r_lo & 3,
    )
    ev_key = jnp.where(
        mo_row,
        (r_pos.astype(jnp.uint32) << 3) | sp6_row,
        jnp.uint32(0xFFFFFFFF),
    )
    fill_row = jnp.where(
        is_spec1,
        spec_char_row,
        jnp.where(mi_row, jnp.uint8(0), pred_single_row),
    )

    # ---- no scatter back to position space ----
    # Every SP/blue consumer works from ROW space: stage_finish
    # compacts mo/mi rows (one small sort), reads positions and block
    # starts from r_pos/seg_start at those rows, and recovers the
    # per-position SP index with a merged-sort count against the
    # (tiny) sorted SP position list.
    L = jnp.sum(mo_row.astype(I32)) + jnp.sum(
        (spec_branch_pos < n_real).astype(I32)
    )
    B = jnp.sum(mi_row.astype(I32))

    # partial BWT: case-2 runs + specials in place; case-3 slots zeroed
    bwt6_partial = jnp.where(row_valid, fill_row, 0)[:N]
    # x2p stays device-resident for stage_finish (no re-transfer)
    r_pos_node = jnp.where(is_node_row, r_pos, N)
    return (
        bwt6_partial, ev_key, mi_row, seg_start, r_pos_node,
        bwt_char, L, B, x2p,
    )


@functools.partial(
    jax.jit, static_argnames=("m", "N", "L_cap", "B_cap", "n_sharp_cap")
)
def stage_finish(
    x2p, ev_key, mi_row, seg_start, r_pos, bwt_char,
    bwt6_partial, spec_branch_pos, n_real,
    m: int, N: int, L_cap: int, B_cap: int, n_sharp_cap: int = 1,
):
    k = m - 1
    SENT = jnp.uint32(0xFFFFFFFF)

    def _compact_rows(mask, cap):
        cs = jnp.cumsum(mask.astype(I32))
        q = jnp.arange(cap, dtype=I32) + 1
        rows = jnp.searchsorted(cs, q, side="left").astype(I32)
        return jnp.minimum(rows, mask.shape[0] - 1), q <= cs[-1]

    # SP stream: node events arrive as ready-made pos<<3|char keys
    # from stage_graph (ev_key); special-branch events (tiny: at most
    # n_reads*k rows) get the same packing here — their SP char is the
    # raw text char k ahead, since special positions always have
    # dist < k (build_special: d in [0, k-1]), so the separator-tail
    # branch can never apply to them. One 1-operand sort yields the SP
    # stream in text order with the char riding in the low bits — no
    # post-sort gathers (positions are unique, so the packed order is
    # the position order).
    brv = spec_branch_pos < n_real
    br = jnp.where(brv, spec_branch_pos, N)
    br_c = x2p[jnp.minimum(br + k, x2p.shape[0] - 1)].astype(jnp.uint32)
    br_key = jnp.where(brv, (br.astype(jnp.uint32) << 3) | br_c, SENT)
    allk = jnp.concatenate([ev_key, br_key])
    if allk.shape[0] < L_cap:        # caps can exceed R on tiny inputs
        allk = jnp.concatenate(
            [allk, jnp.full(L_cap - allk.shape[0], SENT, jnp.uint32)]
        )
    key_s = ops.msort((allk,), num_keys=1, site="sp")[0][:L_cap]
    sp_pos = (key_s >> 3).astype(I32)    # SENT>>3 = 2^29-1 >= any cap
    sp6 = jnp.where(sp_pos < N, (key_s & 7).astype(U8), jnp.uint8(0))
    # Suffix ranks over the true length L (end-of-string handled as a
    # sentinel smaller than every char — identical ordering to the
    # previous zero-tail semantics, since 0 is the minimum char: the
    # first nonzero real char wins, else the shorter suffix is
    # smaller). True-length semantics let the rank loop terminate in
    # O(log max-tie) rounds instead of O(log L_cap).
    L_dyn = jnp.sum((sp_pos < N).astype(I32))
    rank = _suffix_ranks(sp6, L_dyn)

    # blue entries straight from row space; key3 = bp<<3 | bwt_char
    # keeps equal-(block, rank) entries in ascending-position order
    # (the reference's queue-drain discipline,
    # src/generateSP.c:662-680) while the char rides the key — 3
    # operands, 3 distinct keys, no payload.
    bk = jnp.where(mi_row, r_pos, N)
    # mask the payload on non-mi rows too: pad rows share key N,
    # and the sort is unstable, so live seg_start payloads on pad
    # rows would surface nondeterministically to any future
    # consumer — make them inert by construction
    sg = jnp.where(mi_row, seg_start, N)
    if bk.shape[0] < B_cap:          # caps can exceed R on tiny inputs
        pad_n = B_cap - bk.shape[0]
        bk = jnp.concatenate([bk, jnp.full(pad_n, N, I32)])
        sg = jnp.concatenate([sg, jnp.full(pad_n, N, I32)])
    bp, b_base = ops.msort((bk, sg), num_keys=1, site="bk")
    bp, b_base = bp[:B_cap], b_base[:B_cap]
    bval = bp < N
    b_base = jnp.where(bval, b_base, N)
    bpc = jnp.minimum(bp, N - 1)
    # sp index of a position = #SP events strictly before it, by
    # merged-sort counting: events keyed 2p+1 sort AFTER a query keyed
    # 2p, so an event AT the query position is (correctly) not counted
    keys2 = jnp.concatenate(
        [jnp.minimum(sp_pos, N) * 2 + 1, bp * 2]
    )
    pay = jnp.concatenate(
        [jnp.full(L_cap, -1, I32), jnp.arange(B_cap, dtype=I32)]
    )
    k_s, p_s = ops.msort((keys2, pay), num_keys=1, site="mg")
    is_ev = (p_s < 0).astype(I32)
    before = jnp.cumsum(is_ev) - is_ev
    sp_idx = jnp.zeros(B_cap, I32).at[
        jnp.where(p_s >= 0, p_s, B_cap)
    ].set(before, mode="drop")
    b_rank = rank[jnp.minimum(sp_idx, L_cap - 1)]
    if N < (1 << 28):
        # pos<<3 | char fits i32; 3 operands, 3 distinct keys
        b_pc = (bp << 3) | bwt_char[bpc].astype(I32)
        base_s, _, pc_s = ops.msort((b_base, b_rank, b_pc), num_keys=3, site="blue")
        char_s = (pc_s & 7).astype(U8)
    else:
        # N in [2^28, 2^29): position no longer fits beside the char
        base_s, _, _, char_s = ops.msort(
            (b_base, b_rank, bp, bwt_char[bpc]), num_keys=3, site="blue"
        )
    idx = jnp.arange(B_cap, dtype=I32)
    first = jnp.ones(B_cap, bool).at[1:].set(base_s[1:] != base_s[:-1])
    within = idx - jax.lax.cummax(jnp.where(first, idx, -1))
    tgt = jnp.where(base_s < N, base_s + within, N)
    bwt6 = bwt6_partial.at[tgt].set(char_s, mode="drop")
    # zero the bucket-padding tail so packed words are clean
    bwt6 = jnp.where(jnp.arange(N, dtype=I32) < n_real, bwt6, 0)
    packed = ops.pack_2bit_words(jnp.where(bwt6 >= 4, jnp.uint8(3), bwt6))
    # sidecars + conservation counts on device (keeps d2h tiny);
    # counts via masked sums, not bincount (scatter-add serializes)
    sharp_rows, sharp_ok = _compact_rows(bwt6 == 4, n_sharp_cap)
    sharp = jnp.where(sharp_ok, sharp_rows, N)
    n_sharp = jnp.sum((bwt6 == 4).astype(I32))
    dollar = jnp.argmax(bwt6 == 5).astype(I32)   # exactly one '$'
    in_range = jnp.arange(N, dtype=I32) < n_real
    counts6 = jnp.stack(
        [jnp.sum((bwt6 == c) & in_range, dtype=I32) for c in range(6)]
    )
    return bwt6, packed, sharp, dollar, n_sharp, counts6


def _suffix_ranks(sp6, L_dyn):
    """Suffix ranks of sp6[0:L_dyn] by prefix TRIPLING (each round sorts
    on (rank[i], rank[i+h], rank[i+2h]), covering prefix 3h) inside a
    while_loop that stops as soon as all ranks are distinct.

    Ranks are order-encodings, not dense: round 0 packs 10 biased chars
    (0 = past-end sentinel, 1..6 = chars, 3 bits each = 30 bits) into
    one int32, so the loop starts at h=10; the returned ranks are whatever dense
    numbering the last round produced — callers use them only as sort
    keys. Capacity-pad rows (i >= L_dyn) get distinct negative ranks so
    they can never stall the all-distinct early exit, and every
    lookahead past L_dyn reads the -1 sentinel, so suffixes shorter
    than h are fully resolved once the round covering h runs — rounds
    scale with the longest repeated substring of the SP string, not
    with the capacity.

    Lookaheads are dynamic-start contiguous slices of a padded rank
    buffer (cheap on TPU), never random gathers.
    """
    M = sp6.shape[0]
    idx = jnp.arange(M, dtype=I32)
    H0 = 10
    real = idx < L_dyn
    c = jnp.where(real, sp6.astype(I32) + 1, 0)
    c_pad = jnp.concatenate([c, jnp.zeros(H0, I32)])
    rank0 = jnp.zeros(M, I32)
    for i in range(H0):                  # static slices, not gathers
        rank0 = (rank0 << 3) | c_pad[i : i + M]
    rank0 = jnp.where(real, rank0, idx - M)   # pads: distinct, negative
    neg = jnp.full(M, -1, I32)

    def look(rank_ext, step):
        sl = jax.lax.dynamic_slice(rank_ext, (step,), (M,))
        return jnp.where(idx + step < L_dyn, sl, -1)

    def body(carry):
        rank, step, _done = carry
        rank_ext = jnp.concatenate([rank, neg, neg])
        r2 = look(rank_ext, step)
        r3 = look(rank_ext, 2 * step)
        r_s, r2_s, r3_s, i_s = ops.msort((rank, r2, r3, idx), num_keys=3, site="rank")
        new = jnp.ones(M, I32)
        new = new.at[1:].set(
            (
                (r_s[1:] != r_s[:-1])
                | (r2_s[1:] != r2_s[:-1])
                | (r3_s[1:] != r3_s[:-1])
            ).astype(I32)
        )
        csum = jnp.cumsum(new)
        rank = jnp.zeros(M, I32).at[i_s].set(csum - 1)
        all_distinct = csum[-1] == M
        return rank, step * 3, all_distinct

    def cond(carry):
        _rank, step, done = carry
        return (~done) & (step < M)

    rank, _, _ = jax.lax.while_loop(
        cond, body, (rank0, jnp.int32(H0), jnp.bool_(False))
    )
    return rank
