"""Device-resident grouped engine — the 300 Mbp-3.7 Gbp single-chip tier.

The fused engine (engine.py) sorts all N rows in one program and is
HBM-capped near 300M rows by XLA's sort-temp inflation; the out-of-core
tier (oocore.py) is unbounded but round-trips ~26 GB/Gbp through the
host, which on tunneled TPU links (~25-370 ms latency, ~100 MB/s)
costs ~40x the device compute. This tier erases that cliff with a
middle path that NEVER ships keys across the link:

  * the 2-bit packed text stays resident in HBM (0.25 GB/Gbp);
  * the key space is cut into G groups by sampled equal-depth
    splitters on full 62-bit node keys (the balance role of the
    reference's bucket histograms, src/mySort.c:98-110, at maximal
    depth — any hot shared prefix can be split);
  * per group, ONE device program re-derives every row from the text
    (window keys via the Pallas kernel), keeps the rows whose keys
    fall in the group's range (compaction by sort: masked rows carry
    all-ones keys and sink to the tail), and accumulates them into a
    bounded device buffer across text chunks inside one fori_loop —
    one dispatch per group for the whole selection;
  * a second program per group runs the engine's one-sort
    classification (same row semantics as engine.stage_graph,
    reference mergeKmer src/INandOut.c:252-445) on the group's rows.
    Groups are processed in ascending key order, so the sorted row
    index plus the running base IS the global BWT coordinate;
  * only outputs cross to the host: 4-bit-packed fill characters
    (~0.5 B/position), SP event positions and blue entries (branch
    events only — tiny next to the text). SP ranking and the blue
    fill reuse the out-of-core tier's proven host/device back half
    (oocore._sp_ranks_host, oocore.blue_coordinates).

Positions ride as uint32 on device (int64 on host), which bounds this
tier at N < 3.75e9 (~3.7 Gbp) — beyond that api.build routes to the
out-of-core tier. Per-group key recomputation costs G extra text
scans; sorts are the cheap currency on TPU (measured r04: a 4-operand
sort of 168M rows is 1.4 s while the same rows' host round-trip is
minutes on the tunnel), so this trade is the whole point.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from debwt_tpu import constants as K
from debwt_tpu import ops
from debwt_tpu.kernels.seg_or import seg_scan_or, seg_suffix_or
from debwt_tpu.pipeline import BwtResult, _bucket, _pow2
from debwt_tpu.special import build_special
from debwt_tpu.types import PipelineConfig, SequenceCollection

I32 = jnp.int32
U8 = jnp.uint8
U32 = jnp.uint32
KEY_MAX = jnp.uint32(0xFFFFFFFF)
POS_STOP = 1 << 29

# uint32 row-class encoding in the third sort operand:
#   main row:   global position            (< ORD_SPEC)
#   special:    ORD_SPEC | global spec_j   (spec_j < 2^28)
#   pad:        0xFFFFFFFF
ORD_SPEC = np.uint32(0xE0000000)
ORD_PAD = np.uint32(0xF0000000)
# hard ceiling on N for this tier (positions as uint32 below ORD_SPEC;
# also keeps the chunk-local separator-window arithmetic wrap-safe)
MAX_N = int(ORD_SPEC)


@dataclasses.dataclass(frozen=True)
class GroupedConfig:
    """Knobs for the grouped device-resident tier.

    cap:     rows per group buffer (device peak memory ~ 13 B * cap
             plus sort temps). Must be even.
    chunk:   text positions per selection step inside the group scan.
    sp_cap:  max SP-string length rankable on one device (past it, SP
             ranking shards over `mesh` — the ooc x dist composition).
    fill:    target group fill fraction (slack for splitter sampling
             error; overflow is detected and retried with more groups).
    """

    # None -> DEBWT_GROUPED_CAP env var (read per build, not at
    # import) -> 240M, the measured-safe HBM point on a 16 GB chip
    cap: int | None = None
    chunk: int = 1 << 27
    sp_cap: int = 1 << 28
    fill: float = 0.85

    def resolved_cap(self) -> int:
        if self.cap is not None:
            return self.cap
        return int(os.environ.get("DEBWT_GROUPED_CAP", 240_000_000))


class GroupOverflow(RuntimeError):
    pass


def _node62(whi, wlo):
    """The full k-char node key (m-window >> 2, dropping the choice
    char) as a (hi, lo) uint32 pair — the 62-bit splitter comparison
    value. Full-depth splitters mean ANY hot shared prefix can be
    split; only a single node key with more than `cap` occurrences is
    unsplittable (node groups must stay group-local), and that case
    raises GroupOverflow for api.build to route to the out-of-core
    tier's giant-bucket fallback."""
    return whi >> 2, (whi << 30) | (wlo >> 2)


def _ge64(ahi, alo, bhi, blo):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def sample_splitters64(x2: np.ndarray, n: int, k: int, seed: int = 17,
                       samples: int = 1 << 18) -> np.ndarray:
    """n-1 equal-depth uint64 splitters over full k-char node keys
    (the balance role of mySort's cumulative bucket counts,
    src/mySort.c:104-110, at maximal depth)."""
    P = max(1, x2.shape[0] - k)
    idx = np.random.default_rng(seed).integers(0, P, size=samples)
    v = np.zeros(samples, dtype=np.uint64)
    for i in range(k):
        v = (v << np.uint64(2)) | x2[
            np.minimum(idx + i, x2.shape[0] - 1)
        ].astype(np.uint64)
    v.sort()
    qs = (np.arange(1, n) * samples) // n
    return v[qs]


@functools.partial(
    jax.jit, static_argnames=("m", "C", "cap", "n_chunks", "E")
)
def _select_group(
    x2w_ext,      # uint32[W] packed codes of [16 T's] + text + T padding
    sep_pos,      # uint32[n_cap] separator positions (pad 0xFFFFFFFF)
    n_real,       # uint32 scalar: true text length N
    g_lo_hi, g_lo_lo,   # uint32 scalars: 62-bit group range lower bound
    g_hi_hi, g_hi_lo,   # uint32 scalars: exclusive upper bound
    g_last,       # bool scalar: last group (upper bound open)
    m: int, C: int, cap: int, n_chunks: int, E: int,
):
    """Scan all text chunks; accumulate the main rows whose node keys
    fall in this group's range into a (cap + C)-row buffer. Returns
    (hi, lo, ord, f8, n_rows); rows beyond n_rows are all-ones pads.
    One device dispatch covers the whole text."""
    k = m - 1
    EW = E // 16
    SE = C + k + 2            # separator extent [c0-1, c0+C+k]

    def body(ci, carry):
        bhi, blo, bord, bf8, off = carry
        w0 = ci * (C // 16)
        words = jax.lax.dynamic_slice(x2w_ext, (w0,), (EW,))
        x2c = ops.unpack_2bit_words(words, E)   # x2c[j] = char at c0-16+j
        c0u = ci.astype(U32) * jnp.uint32(C)
        whi, wlo = ops.window_keys(x2c[16 : 16 + C + m - 1], m)
        pred = x2c[15 : 15 + C]
        # chunk-local separator mask over [c0-1, c0+C+k]
        loc = sep_pos - (c0u - jnp.uint32(1))    # wraps for out-of-extent
        in_ext = loc < SE
        is_sep_ext = jnp.zeros(SE, bool).at[
            jnp.where(in_ext, loc, SE).astype(I32)
        ].set(True, mode="drop")
        idx = jnp.arange(SE, dtype=I32)
        wds = jnp.where(is_sep_ext, idx | POS_STOP, 0)
        wds = jnp.where(idx >= SE - 1, idx | POS_STOP, wds)
        nxt = seg_scan_or(wds, stop_bit=POS_STOP) & (POS_STOP - 1)
        dist = nxt[1 : 1 + C] - (jnp.arange(C, dtype=I32) + 1)
        pos_u = c0u + jnp.arange(C, dtype=U32)
        head = is_sep_ext[:C] | (pos_u == 0)
        valid = pos_u < n_real
        is_main = (dist >= k) & valid
        is_tailw = dist == k
        nhi, nlo = _node62(whi, wlo)
        in_g = (
            is_main
            & _ge64(nhi, nlo, g_lo_hi, g_lo_lo)
            & (g_last | ~_ge64(nhi, nlo, g_hi_hi, g_hi_lo))
        )
        predf = jnp.where(head, jnp.uint8(7), pred)
        f8 = (
            (is_tailw.astype(U8) << 4) | (head.astype(U8) << 3) | predf
        )
        shi = jnp.where(in_g, whi, KEY_MAX)
        slo = jnp.where(in_g, wlo, KEY_MAX)
        sord = jnp.where(in_g, pos_u, KEY_MAX)
        sf8 = jnp.where(in_g, f8, jnp.uint8(0))
        # compaction by sort: selected rows form the prefix (their
        # third key < 0xFFFFFFFF even when the window is all-T)
        shi, slo, sord, sf8 = ops.msort(
            (shi, slo, sord, sf8), num_keys=3, site="gsel"
        )
        cnt = jnp.sum(in_g.astype(I32))
        # append-with-overwrite: the C-row slice lands at off; its pad
        # tail (all-ones rows) is overwritten by the next chunk's
        # append at off + cnt, and any final tail stays all-ones
        off_c = jnp.minimum(off, cap)     # clamp keeps pads in-bounds
        bhi = jax.lax.dynamic_update_slice(bhi, shi, (off_c,))
        blo = jax.lax.dynamic_update_slice(blo, slo, (off_c,))
        bord = jax.lax.dynamic_update_slice(bord, sord, (off_c,))
        bf8 = jax.lax.dynamic_update_slice(bf8, sf8, (off_c,))
        return bhi, blo, bord, bf8, off + cnt

    init = (
        jnp.full(cap + C, KEY_MAX, U32),
        jnp.full(cap + C, KEY_MAX, U32),
        jnp.full(cap + C, KEY_MAX, U32),
        jnp.zeros(cap + C, U8),
        jnp.int32(0),
    )
    bhi, blo, bord, bf8, off = jax.lax.fori_loop(0, n_chunks, body, init)
    return bhi, blo, bord, bf8, off


@functools.partial(jax.jit, static_argnames=("m", "cap", "ns_cap"))
def _classify_group(
    bhi, blo, bord, bf8,            # (>= cap)-row select buffers
    s_hi2, s_lo2, s_ord, s_c6,      # uint32/uint8[ns_cap] special rows
    m: int, cap: int, ns_cap: int,
):
    """The engine's one-sort classification on one group's rows
    (engine.stage_graph semantics; reference mergeKmer
    src/INandOut.c:252-445). Group-local row indices stay int32.

    Returns (fill2, b_key, b_sgc, b_pos, n_g, E_g):
      fill2   uint8[(cap+ns_cap)/4] 2-bit-packed partial BWT chars of
              the first n_g sorted rows (blue slots zero; fills are
              provably in 0..3 — see the pack comment below)
      b_key   uint32[R] compaction keys: local idx<<2 | flags
              (flag 1 = SP event, 2 = blue); live prefix length E_g
      b_sgc   uint32[R] blue (segment start << 3) | BWT char
      b_pos   uint32[R] row positions
    """
    R = cap + ns_cap
    assert R < (1 << 29), R           # packed fact-broadcast bound
    assert R % 4 == 0, R              # 2-bit fill packing
    r_hi = jnp.concatenate([bhi[:cap], s_hi2])
    r_lo = jnp.concatenate([blo[:cap], s_lo2])
    r_ord = jnp.concatenate([bord[:cap], s_ord])
    r_f8 = jnp.concatenate([bf8[:cap], s_c6])
    r_hi, r_lo, r_ord, r_f8 = ops.msort(
        (r_hi, r_lo, r_ord, r_f8), num_keys=3, site="gcls"
    )
    is_node = r_ord < jnp.uint32(ORD_SPEC)
    is_spec = (r_ord >= jnp.uint32(ORD_SPEC)) & (r_ord < jnp.uint32(ORD_PAD))
    row_valid = r_ord < jnp.uint32(ORD_PAD)
    r_pred = (r_f8 & 7).astype(U8)
    r_head = (r_f8 & 8) != 0
    r_tailw = (r_f8 & 16) != 0
    node_lo = r_lo >> 2
    cls = jnp.where(is_node, 0, jnp.where(is_spec, 1, 2))
    newseg = jnp.ones(R, bool)
    newseg = newseg.at[1:].set(
        (r_hi[1:] != r_hi[:-1])
        | (node_lo[1:] != node_lo[:-1])
        | (cls[1:] != cls[:-1])
    )
    choice_chg = jnp.zeros(R, bool).at[1:].set(
        (r_lo[1:] & 3) != (r_lo[:-1] & 3)
    )
    mo_ind = ((choice_chg & ~newseg) | r_tailw) & is_node

    # six presence facts in one segmented suffix-OR (engine.stage_graph)
    pred_bit = jax.lax.shift_left(jnp.int32(1), r_pred.astype(I32)) & 15
    bits = (
        jnp.where(is_node, pred_bit, 0)
        | jnp.where(r_head & is_node, 16, 0)
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
    pred_single = jnp.where(in_d == 1, pred_sum, 0)
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
    mo_row = ((f_row & 1) != 0) & is_node
    mi_row = ((f_row & 2) != 0) & is_node
    pred_single_row = ((f_row >> 2) & 3).astype(U8)
    spec_char_row = (r_f8 & 7).astype(U8)
    fill_row = jnp.where(
        is_spec,
        spec_char_row,
        jnp.where(mi_row, jnp.uint8(0), pred_single_row),
    )
    fill6 = jnp.where(row_valid, fill_row, 0).astype(U8)
    n_g = jnp.sum(row_valid.astype(I32))

    # blue char source (the row's own BWT char): pos 0 -> '$',
    # head -> '#', else the predecessor char
    bchar = jnp.where(
        r_ord == 0, jnp.uint8(5),
        jnp.where(r_pred == 7, jnp.uint8(4), r_pred),
    ).astype(U8)

    # SP events (multi-out rows: the reference emits the char k ahead
    # per multi-out position, src/generateSP.c:626-651 — here that's
    # just the row position; the host recomputes the char) and blue
    # entries (multi-in rows) compact together in ONE 3-operand sort:
    # flags ride the compaction key's low bits (local idx < 2^29, so
    # idx<<2|flags fits uint32) and (seg_start, char) pack into one
    # word (seg_start < 2^29, char 3 bits). The host splits the tiny
    # branch-event prefix with a mask.
    ev_blue = mo_row | mi_row
    flags = mo_row.astype(U32) | (mi_row.astype(U32) << 1)
    bkey = jnp.where(
        ev_blue, (idx.astype(U32) << 2) | flags, KEY_MAX
    )
    sgc = jnp.where(
        mi_row,
        (seg_start.astype(U32) << 3) | bchar.astype(U32),
        0,
    )
    bpos = jnp.where(ev_blue, r_ord, KEY_MAX)
    b_key, b_sgc, b_pos = ops.msort(
        (bkey, sgc, bpos), num_keys=1, site="gbl"
    )
    E_g = jnp.sum(ev_blue.astype(I32))

    # fills are provably in 0..3 here: spec chars are x6[p-1] with p-1
    # never a separator (reads longer than k, special.py), case-2
    # chars are single predecessor bases, and every '#'/'$' BWT char
    # belongs to a multi-in (blue) slot — head rows force mi_seg — so
    # those arrive via the host blue fill. 2-bit pack: 4 chars/byte.
    fill2 = (
        (fill6[0::4] << 6) | (fill6[1::4] << 4)
        | (fill6[2::4] << 2) | fill6[3::4]
    )
    return fill2, b_key, b_sgc, b_pos, n_g, E_g


def _plan_groups(coll, k: int, cap: int, fill: float, attempt: int):
    """Equal-depth 62-bit splitters for G groups of ~`fill * cap`
    rows each."""
    N = coll.bwt_len
    G = max(1, -(-N // max(1, int(cap * fill))))
    G = min(65536, G << attempt)      # retry doubles the group count
    if G == 1:
        return G, np.empty(0, np.uint64)
    splitters = sample_splitters64(
        coll.x2, G, k, seed=17 + attempt, samples=1 << 18
    )
    return G, splitters


def build_bwt_grouped(
    coll: SequenceCollection,
    config: PipelineConfig | None = None,
    gcfg: GroupedConfig | None = None,
    stats: dict | None = None,
    mesh=None,
) -> BwtResult:
    """Construct the BWT with bounded device memory and ~0.6 B/position
    of host<->device traffic. stats, when given, is filled with the
    group plan (test hook). mesh enables sharded SP ranking past
    gcfg.sp_cap (the ooc x dist composition)."""
    from debwt_tpu.oocore import OocConfig, _sp_ranks_host, blue_coordinates

    config = config or PipelineConfig()
    gcfg = gcfg or GroupedConfig()
    m, k = config.m, config.k
    N = coll.bwt_len
    if N >= MAX_N:
        raise NotImplementedError(
            f"grouped tier holds positions as uint32 (N < {MAX_N}); "
            "route larger collections to the out-of-core tier"
        )
    trace = os.environ.get("DEBWT_TRACE") == "1"
    timings: dict = {}
    _t0 = [time.time()]

    def _say(msg):
        if trace:
            print(f"[debwt-tpu grouped] {msg}", file=sys.stderr)

    def _mark(label):
        now = time.time()
        timings[label] = timings.get(label, 0.0) + (now - _t0[0])
        _t0[0] = now

    sp = build_special(coll, m)
    n_spec = sp.spec_tfill.shape[0]
    assert n_spec < (1 << 28), n_spec
    _mark("special module (host)")

    cap = gcfg.resolved_cap()
    cap -= cap % 4
    C = min(gcfg.chunk, _pow2(max(1024, N)))
    C -= C % 16
    n_chunks = -(-N // C)
    E = C + m + 15
    E += (-E) % 16

    # packed text with a 16-char T prologue (predecessor reads at chunk
    # starts) and a T tail covering the last chunk's window lookahead
    from debwt_tpu.special import _cached_buf

    ext_len = 16 + (n_chunks - 1) * C + E
    x2ext = _cached_buf("grouped_ext", ext_len)
    x2ext[:16] = K.T
    x2ext[16 : 16 + N] = coll.x2
    x2ext[16 + N :] = K.T
    x2w_ext = jax.device_put(jnp.asarray(ops.pack_2bit_words_host(x2ext)))
    del x2ext
    sep_d = jnp.asarray(
        np.pad(
            coll.sep.astype(np.uint32),
            (0, _pow2(coll.n_reads) - coll.n_reads),
            constant_values=np.uint32(0xFFFFFFFF),
        )
    )
    _mark("text pack (host)")

    # special row operands (the engine's T-filled m-window trick:
    # spec key = node62 << 2 | T)
    s_hi = (sp.spec_tfill >> np.uint64(32)).astype(np.uint32)
    s_lo = (sp.spec_tfill & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    s_hi2_all = (s_hi << np.uint32(2)) | (s_lo >> np.uint32(30))
    s_lo2_all = (s_lo << np.uint32(2)) | np.uint32(3)
    s_ord_all = ORD_SPEC | np.arange(n_spec, dtype=np.uint32)
    # spec_tfill IS the k-char node key — the 62-bit splitter domain
    spec_topc = sp.spec_tfill

    n_real_u = np.uint32(N)
    fine = {"select": 0.0, "classify": 0.0, "fetch": 0.0}

    for attempt in range(4):
        G, splitters = _plan_groups(coll, k, cap, gcfg.fill, attempt)
        spec_dest = (
            np.searchsorted(splitters, spec_topc, side="right")
            if G > 1 else np.zeros(n_spec, np.int64)
        )
        spec_counts = np.bincount(spec_dest, minlength=G)
        ns_cap = _pow2(max(16, int(spec_counts.max(initial=0))))
        # right-size the buffer to the plan: sort cost scales with the
        # static cap, not the live rows, so a half-full buffer would
        # pay double — shrink to the expected group size plus slack
        cap_run = min(cap, _bucket(int(N / G / gcfg.fill)))
        cap_run += (-cap_run) % 4
        _say(f"plan: G={G} groups, cap={cap_run}, chunk={C} x {n_chunks}, "
             f"ns_cap={ns_cap}")

        def _sel(g):
            lo64 = int(splitters[g - 1]) if g else 0
            hi64 = int(splitters[g]) if g < G - 1 else 0
            return _select_group(
                x2w_ext, sep_d, n_real_u,
                np.uint32(lo64 >> 32), np.uint32(lo64 & 0xFFFFFFFF),
                np.uint32(hi64 >> 32), np.uint32(hi64 & 0xFFFFFFFF),
                np.bool_(g == G - 1), m, C, cap_run, n_chunks, E,
            )

        def _sp_pad(a, fillv, smask):
            out = np.full(ns_cap, fillv, dtype=a.dtype)
            sel_a = a[smask]
            out[: sel_a.shape[0]] = sel_a
            return jnp.asarray(out)

        bwt6 = np.empty(N, dtype=np.uint8)
        ev_parts: list[np.ndarray] = []
        blue_parts: list[tuple] = []
        base = 0
        overflow = False
        t0 = time.time()
        sel = _sel(0)
        for g in range(G):
            n_main = int(sel[4])      # blocks: selection done
            fine["select"] += time.time() - t0
            t0 = time.time()
            if n_main > cap_run:
                _say(f"group {g} overflow: {n_main} rows > cap "
                     f"{cap_run}; retrying with more groups")
                overflow = True
                break
            smask = spec_dest == g
            outs = _classify_group(
                sel[0], sel[1], sel[2], sel[3],
                _sp_pad(s_hi2_all, np.uint32(0xFFFFFFFF), smask),
                _sp_pad(s_lo2_all, np.uint32(0xFFFFFFFF), smask),
                _sp_pad(s_ord_all, np.uint32(0xFFFFFFFF), smask),
                _sp_pad(sp.spec_bwt6, np.uint8(0), smask),
                m, cap_run, ns_cap,
            )
            fill2, b_key, b_sgc, b_pos, n_g_d, E_g_d = outs
            n_g, E_g = int(n_g_d), int(E_g_d)   # blocks: classify done
            assert n_g == n_main + int(smask.sum()), (
                n_g, n_main, int(smask.sum())
            )
            nb = (n_g + 3) // 4
            # slice the live prefixes (small device arrays), release
            # the full outputs, then dispatch the NEXT group's select
            # so its device compute overlaps this group's fetches
            sl = (fill2[:nb], b_key[:E_g], b_sgc[:E_g], b_pos[:E_g])
            del outs, fill2, b_key, b_sgc, b_pos
            fine["classify"] += time.time() - t0
            t0 = time.time()
            if g + 1 < G:
                sel = _sel(g + 1)
            tf = time.time()
            f2 = np.asarray(jax.device_get(sl[0]))
            key_h = np.asarray(jax.device_get(sl[1]))
            sgc_h = np.asarray(jax.device_get(sl[2]))
            pos_h = np.asarray(jax.device_get(sl[3])).astype(np.int64)
            del sl
            seg = np.empty(4 * nb, dtype=np.uint8)
            seg[0::4] = f2 >> 6
            seg[1::4] = (f2 >> 4) & 3
            seg[2::4] = (f2 >> 2) & 3
            seg[3::4] = f2 & 3
            bwt6[base : base + n_g] = seg[:n_g]
            is_ev = (key_h & 1) != 0
            is_bl = (key_h & 2) != 0
            L_g, B_g = int(is_ev.sum()), int(is_bl.sum())
            if L_g:
                ev_parts.append(pos_h[is_ev])
            if B_g:
                blue_parts.append((
                    base + (sgc_h[is_bl] >> 3).astype(np.int64),
                    pos_h[is_bl],
                    (sgc_h[is_bl] & 7).astype(np.uint8),
                ))
            base += n_g
            fine["fetch"] += time.time() - tf
            _say(f"group {g}: rows={n_g} sp={L_g} blue={B_g} "
                 f"base={base}")
            t0 = time.time()
        if not overflow:
            break
    else:
        raise GroupOverflow(
            "group overflow persisted after 4 full-depth splitter "
            "refinements — a single node key has more than `cap` "
            "occurrences and node groups must stay group-local; "
            "api.build falls back to the out-of-core tier, whose "
            "giant-bucket path handles this"
        )
    assert base == N, (base, N)
    _mark("group passes (device)")
    for kk, vv in fine.items():
        timings[f"groups.{kk}"] = round(vv, 3)

    # ---- SP string + ranks + blue fill: the ooc back half ----
    x2p = np.concatenate(
        [coll.x2, np.full(K.TAIL_PAD, K.T, dtype=np.uint8)]
    )
    sep = coll.sep
    sp_pos = np.sort(np.concatenate(
        ev_parts + [sp.spec_branch_pos.astype(np.int64)]
    )) if (ev_parts or sp.spec_branch_pos.size) else np.empty(0, np.int64)
    L = sp_pos.shape[0]
    nxt = np.searchsorted(sep, sp_pos)
    d_at = sep[nxt] - sp_pos
    is_sepc = d_at == k
    sp6 = np.where(
        is_sepc, np.where(sp_pos + k == N - 1, 5, 4), x2p[sp_pos + k]
    ).astype(np.uint8)
    rank = _sp_ranks_host(
        sp6, L, OocConfig(sp_cap=gcfg.sp_cap), mesh, _say
    )
    _mark("SP rank")

    n_blue = 0
    if blue_parts:
        b_base = np.concatenate([p[0] for p in blue_parts])
        b_pos = np.concatenate([p[1] for p in blue_parts])
        b_char = np.concatenate([p[2] for p in blue_parts])
        n_blue = b_base.shape[0]
        coords, chars = blue_coordinates(b_base, b_pos, b_char, rank, sp_pos)
        bwt6[coords] = chars
    _mark("blue fill")

    if stats is not None:
        stats.update(
            n_groups=G, cap=cap, chunk=C, n_chunks=n_chunks,
            ns_cap=ns_cap, sp_len=L, n_blue=n_blue,
            sharded_rank=L > gcfg.sp_cap,
            stage_s={k_: round(v, 3) for k_, v in timings.items()},
        )
    if config.check:
        got = np.bincount(bwt6, minlength=6)
        want = np.bincount(coll.x6, minlength=6)
        assert (got == want).all(), (got, want)
    (sharp,) = np.nonzero(bwt6 == K.SHARP)
    (dollar,) = np.nonzero(bwt6 == K.DOLLAR)
    assert dollar.shape[0] == 1, dollar
    return BwtResult(
        sharp_pos=sharp.astype(np.int64),
        dollar_pos=int(dollar[0]),
        _bwt6=bwt6,
        _n=N,
        timings=timings,
    )
