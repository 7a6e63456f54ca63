"""Multi-chip distributed BWT construction (shard_map over a 1-D mesh).

Layout (see parallel/mesh.py):
  * the text is sharded by contiguous position ranges (one shard per
    chip, with an m+pad forward halo and a 1-char back halo);
  * the k-mer/node key space is sharded by leading key bits; every chip
    owns one contiguous key range and therefore one contiguous segment
    of the final BWT (group order == key order).

Collective structure per stage (all traffic rides lax.all_to_all /
all_gather over the mesh axis, i.e. ICI on real slices):

  S0  per-shard edge histograms by destination          (sizing only)
  S1  edges routed to key owners (prefix- and suffix-routed copies);
      local node tables; unit merge with specials; global coordinates
      via an exclusive scan of per-chip segment sizes
  S1b flags for each edge position routed straight back through the
      same slot structure (the response of the S1 exchange)
  S2  text-side classification: SP stream + blue entries; global SP
      indices by scanning per-chip SP counts
  S2b SP stream + blue messages routed to their owners
  S2c the SP string re-blocked across the mesh and ranked SHARDED
      (parallel/sprank.py sample-sort prefix tripling); blue entries
      fetch ranks through a distributed echo lookup
  S3  blue entries routed to their node owners; per-owner ordering and
      segment assembly; segments gathered to host

Static capacities for the exchanges are sized from the S0 histograms
(power-of-two rounded) — the distributed analogue of the reference's
bucket prefix-sums (src/mySort.c:98-110).

Split-index discipline (the 30 Gbp tier): device arrays hold only
shard-LOCAL int32 positions and device-local int32 BWT coordinates;
the source shard of a routed row is its all_to_all slot row, and the
int64 global segment bases exist only in the host stitch. The per-run
bound is per-shard (N/n < 2^31), not global.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from debwt_tpu import constants as K
from debwt_tpu import ops
from debwt_tpu.pipeline import BwtResult, _pow2, _split64
from debwt_tpu.special import build_special
from debwt_tpu.types import PipelineConfig, SequenceCollection
from debwt_tpu.bluesort import sp_suffix_ranks

I32 = jnp.int32
U32 = jnp.uint32
KEY_MAX = jnp.uint32(0xFFFFFFFF)
INV32 = jnp.uint32(0xFFFFFFFF)   # invalid node reference

shard_map = jax.shard_map

# debug capture: set to a dict to stash per-stage intermediates
DEBUG = None


def _fetch(x):
    """Host copy of P('d')-sharded arrays (single array or pytree) —
    device_get single-process, process_allgather when the mesh spans
    hosts. Batch related arrays into ONE call: each call waits for all
    preceding dispatches, and on a tunneled backend that sync costs
    seconds (tools/profile_dist.py)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        out = multihost_utils.process_allgather(x, tiled=True)
    else:
        out = jax.device_get(x)
    return jax.tree.map(np.asarray, out)


def _put(a, sharding):
    """device_put host data under a (possibly multi-host) sharding.
    Every process passes the same full array; only addressable shards
    are materialized locally."""
    a = np.asarray(a)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx]
        )
    return jax.device_put(a, sharding)


def _top_chars(hi, lo, nbits: int, c: int):
    """Top 2c bits (the first c chars) of an nbits-wide right-aligned
    key pair, as uint32."""
    w = 2 * c
    s = nbits - w
    mask = jnp.uint32(0xFFFFFFFF) if w == 32 else jnp.uint32((1 << w) - 1)
    if s >= 32:
        return (hi >> (s - 32)) & mask
    if s > 0:
        return ((hi << (32 - s)) | (lo >> s)) & mask
    return (lo << (-s)) & mask


def _dest_split(hi, lo, nbits: int, splitters, c: int):
    """Key owner via sampled splitters (equal-depth partition of the
    first-c-chars key distribution) instead of a uniform split — the
    distributed analogue of balancing mySort's bucket segments by
    cumulative counts (src/mySort.c:104-110). c = min(16, k) chars, so
    node keys (2k bits) and edge keys (2m bits) agree on the prefix
    and ownership is consistent across both key spaces. 16-char depth
    (vs the old 8) splits hot 8-char buckets — realistic
    low-complexity skew — across devices; only a single k-mer with
    > 1/n mass is unsplittable (node groups must stay device-local by
    design, as in the reference's per-node blocks)."""
    v = _top_chars(hi, lo, nbits, c)
    return jnp.searchsorted(splitters, v, side="right").astype(I32)


def _sample_splitters(x2, n: int, c: int, seed: int = 17,
                      samples: int = 1 << 16):
    """n-1 equal-depth splitters over c-char window prefixes (uint32),
    sampled host-side."""
    P = max(1, x2.shape[0] - c)
    idx = np.random.default_rng(seed).integers(0, P, size=samples)
    v = np.zeros(samples, dtype=np.uint32)
    for i in range(c):
        v = (v << 2) | x2[idx + i].astype(np.uint32)
    v.sort()
    qs = (np.arange(1, n) * samples) // n
    return v[qs]


def _edge_keys_local(x2, dist, m: int):
    """Window keys + validity for one text shard (x2 includes the
    forward halo)."""
    Ns = dist.shape[0]
    hi, lo = ops.window_keys(x2[: Ns + m - 1], m)
    valid = dist >= m
    return hi, lo, valid


def _suffix_key(e_hi, e_lo, k: int):
    if 2 * k >= 32:
        return e_hi & ((jnp.uint32(1) << (2 * k - 32)) - jnp.uint32(1)), e_lo
    return jnp.zeros_like(e_hi), e_lo & ((jnp.uint32(1) << (2 * k)) - jnp.uint32(1))


def _first_char(e_hi, e_lo, k: int):
    if 2 * k >= 32:
        return ((e_hi >> (2 * k - 32)) & 3).astype(I32)
    return ((e_lo >> (2 * k)) & 3).astype(I32)


from debwt_tpu.parallel.collectives import (
    a2a as _a2a,
    exclusive_scan_i32,
    pack_by_dest as _pack_by_dest,
)


def dist_build_bwt(
    coll: SequenceCollection,
    config: PipelineConfig | None = None,
    mesh: Mesh | None = None,
) -> BwtResult:
    config = config or PipelineConfig()
    m, k = config.m, config.k
    if mesh is None:
        from debwt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    n = mesh.devices.size
    N = coll.bwt_len
    n_reads = coll.n_reads
    Ns = -(-N // n)
    # Split-index discipline (the 30 Gbp tier): device arrays only ever
    # hold SHARD-LOCAL int32 positions/coordinates — the source shard
    # of a routed row is its all_to_all slot row, and per-device BWT
    # segment bases are int64 on the host. The only size bound is the
    # per-shard one (the reference's design cap is ~30 Gbp,
    # src/LFsearch.c:56 — that is 14+ devices here).
    HALO = m + K.TAIL_PAD
    if Ns + HALO >= 2**31:
        raise NotImplementedError(
            f"per-shard text of {Ns} chars exceeds int32; use more "
            f"devices (N/n must stay below 2^31)"
        )
    sp = build_special(coll, m)
    x2_full = np.concatenate(
        [coll.x2, np.full(n * Ns - N + HALO, K.T, dtype=np.uint8)]
    )
    x2_sh = np.stack([x2_full[r * Ns : r * Ns + Ns + HALO] for r in range(n)])
    # distances to the next separator, clamped to m+1 (only the
    # {==0, ==k, >=k, >=m} distinctions are consumed; unclamped values
    # overflow int32 when one read exceeds 2^31 chars); padding
    # positions get -1: never main, never special
    nxt = np.searchsorted(coll.sep, np.arange(N))
    dist_full = np.full(n * Ns, -1, dtype=np.int32)
    dist_full[:N] = np.minimum(
        coll.sep[nxt] - np.arange(N), m + 1
    ).astype(np.int32)
    dist_sh = dist_full.reshape(n, Ns)
    prev_char = np.zeros(n, dtype=np.uint8)
    prev_is_sep = np.zeros(n, dtype=bool)
    for r in range(1, n):
        p = r * Ns - 1
        if p < N:
            prev_char[r] = coll.x2[p]
            prev_is_sep[r] = dist_full[p] == 0
    spec_branch = np.zeros(n * Ns, dtype=bool)
    spec_branch[sp.spec_branch_pos] = True
    spec_branch_sh = spec_branch.reshape(n, Ns)

    # replicated small arrays
    tail_hi, tail_lo = _split64(sp.tail_keys)
    # tail keys in READ order (sp.tail_keys is SORTED, matching the
    # reference's tailSharp stream — the per-read flag gather below
    # must align with tp = sep - k instead)
    from debwt_tpu.special import key_of_window

    tailq = key_of_window(coll.x2, coll.sep - k, k)
    tailq_hi, tailq_lo = _split64(tailq)
    head_hi, head_lo = _split64(sp.head_keys)
    s_hi, s_lo = _split64(sp.spec_tfill)
    n_spec = sp.spec_tfill.shape[0]

    split_c = min(16, k)
    splitters16 = jnp.asarray(_sample_splitters(coll.x2, n, split_c))

    sharding = NamedSharding(mesh, P("d"))
    rep = NamedSharding(mesh, P())
    dev = lambda a, s=sharding: _put(a, s)
    x2_d = dev(x2_sh)
    dist_d = dev(dist_sh)
    sb_d = dev(spec_branch_sh)
    pc_d = dev(prev_char)
    ps_d = dev(prev_is_sep)
    th, tl = dev(tail_hi, rep), dev(tail_lo, rep)
    hh, hl = dev(head_hi, rep), dev(head_lo, rep)
    sh_, sl_ = dev(s_hi, rep), dev(s_lo, rep)

    # ---------------- S0: histograms ----------------
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("d"), P("d")), out_specs=(P("d"), P("d")),
    )
    def s0(x2, dist):
        x2, dist = x2[0], dist[0]
        e_hi, e_lo, valid = _edge_keys_local(x2, dist, m)
        d1 = _dest_split(e_hi, e_lo, 2 * m, splitters16, split_c)
        sk_hi, sk_lo = _suffix_key(e_hi, e_lo, k)
        d2 = _dest_split(sk_hi, sk_lo, 2 * k, splitters16, split_c)
        h1 = jnp.bincount(jnp.where(valid, d1, n), length=n + 1)[:n]
        h2 = jnp.bincount(jnp.where(valid, d2, n), length=n + 1)[:n]
        return h1[None], h2[None]

    h1, h2 = s0(x2_d, dist_d)
    h12 = _fetch((h1, h2))
    cap_e = _pow2(max(1, int(h12[0].max()), int(h12[1].max())))
    cap_n = n * cap_e + n_reads + 1

    # ---------------- S1: exchange + node tables + coordinates ----------------
    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("d"), P("d"), P(), P(), P(), P(), P(), P()),
        out_specs=(
            P("d"), P("d"), P("d"), P("d"), P("d"), P("d"), P("d"),
            P("d"), P("d"), P("d"), P("d"), P("d"),
        ),
    )
    def s1(x2, dist, th, tl, hh, hl, sh_, sl_):
        x2, dist = x2[0], dist[0]
        r = jax.lax.axis_index("d")
        e_hi, e_lo, valid = _edge_keys_local(x2, dist, m)
        Ns_l = dist.shape[0]
        # shard-LOCAL int32 positions (split-index discipline: the
        # source shard of a routed row is its all_to_all slot row)
        lpos = jnp.arange(Ns_l, dtype=I32)
        # prefix-routed exchange (carry position)
        d1 = _dest_split(e_hi, e_lo, 2 * m, splitters16, split_c)
        ph, pl, ppos = _pack_by_dest(
            d1, valid, cap_e, n,
            (e_hi, KEY_MAX), (e_lo, KEY_MAX), (lpos, jnp.int32(-1)),
        )
        ph, pl, ppos = _a2a(ph), _a2a(pl), _a2a(ppos)
        # keep slot structure for the response; also build sorted copy
        fh, fl, fpos = ph.reshape(-1), pl.reshape(-1), ppos.reshape(-1)
        sh1, sl1, spos1 = ops.sort_by_key2(fh, fl, fpos)
        # suffix-routed exchange (carry first char)
        sk_hi, sk_lo = _suffix_key(e_hi, e_lo, k)
        fc = _first_char(e_hi, e_lo, k)
        d2 = _dest_split(sk_hi, sk_lo, 2 * k, splitters16, split_c)
        qh, ql, qc = _pack_by_dest(
            d2, valid, cap_e, n,
            (sk_hi, KEY_MAX), (sk_lo, KEY_MAX), (fc, jnp.int32(4)),
        )
        qh, ql, qc = _a2a(qh), _a2a(ql), _a2a(qc)
        # 3-key sort so chars are ASCENDING within each suffix-key
        # segment: distinct counts and the min (= first) char become
        # boundary scans — no scatter-add segment ops, which serialize
        # on TPU (same rationale as engine.stage_graph)
        sh2, sl2, sc2 = jax.lax.sort(
            (qh.reshape(-1), ql.reshape(-1), qc.reshape(-1)), num_keys=3
        )

        def seg_sum_at_start(ind, is_start):
            """Per-segment sum of `ind`, valid at segment-START rows
            (cumsum + reverse-cummin boundary broadcast; the cumsum is
            monotone so cummin carries the segment-end value)."""
            BIGI = jnp.iinfo(jnp.int32).max
            S = jnp.cumsum(ind)
            is_last = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
            seg_end = jax.lax.cummin(
                jnp.where(is_last, S, BIGI), reverse=True
            )
            return seg_end - (S - ind)

        # ---- local node table over owned key range ----
        E_l = sh1.shape[0]
        p_hi, p_lo = ops.key2_shift_right2(sh1, sl1)
        # sentinel edges keep KEY_MAX after shift's high bits? shift of
        # KEY_MAX pair gives 0x3FFFFFFF... — restore sentinels
        is_pad1 = (sh1 == KEY_MAX) & (sl1 == KEY_MAX)
        p_hi = jnp.where(is_pad1, KEY_MAX, p_hi)
        p_lo = jnp.where(is_pad1, KEY_MAX, p_lo)
        pb = ops.run_boundaries(p_hi, p_lo)
        pseg = ops.segment_ids(pb)
        # rows within a prefix segment are sorted by full edge key, so
        # the last char (low 2 key bits) ascends within the segment
        last_char = (sl1 & 3).astype(I32)
        chg1 = pb | jnp.concatenate(
            [jnp.zeros(1, bool), last_char[1:] != last_char[:-1]]
        )
        occ_sz = seg_sum_at_start((~is_pad1).astype(I32), pb)
        ext_sz = seg_sum_at_start(chg1.astype(I32), pb)
        # compact per-segment values at boundary rows (unique indices)
        tgt1 = jnp.where(pb, pseg, E_l)
        pk_hi = jnp.full(E_l, KEY_MAX).at[tgt1].set(p_hi, mode="drop")
        pk_lo = jnp.full(E_l, KEY_MAX).at[tgt1].set(p_lo, mode="drop")
        occ_cnt = jnp.zeros(E_l, I32).at[tgt1].set(occ_sz, mode="drop")
        ext_distinct = jnp.zeros(E_l, I32).at[tgt1].set(
            ext_sz, mode="drop"
        )

        is_pad2 = (sh2 == KEY_MAX) & (sl2 == KEY_MAX)
        sb_ = ops.run_boundaries(sh2, sl2)
        sseg = ops.segment_ids(sb_)
        chg2 = sb_ | jnp.concatenate(
            [jnp.zeros(1, bool), sc2[1:] != sc2[:-1]]
        )
        in_sz = seg_sum_at_start(chg2.astype(I32), sb_)
        tgt2 = jnp.where(sb_, sseg, E_l)
        in_distinct = jnp.zeros(E_l, I32).at[tgt2].set(in_sz, mode="drop")
        # chars ascend within the segment: min = the boundary row's char
        pred_of_seg = jnp.zeros(E_l, I32).at[tgt2].set(
            jnp.where(is_pad2, 4, sc2), mode="drop"
        )
        sk2_hi = jnp.full(E_l, KEY_MAX).at[tgt2].set(sh2, mode="drop")
        sk2_lo = jnp.full(E_l, KEY_MAX).at[tgt2].set(sl2, mode="drop")

        # owned tails/heads
        town = _dest_split(th, tl, 2 * k, splitters16, split_c) == r
        hown = _dest_split(hh, hl, 2 * k, splitters16, split_c) == r
        th_o = jnp.where(town, th, KEY_MAX)
        tl_o = jnp.where(town, tl, KEY_MAX)
        th_o, tl_o = jax.lax.sort((th_o, tl_o), num_keys=2)

        u_hi = jnp.concatenate([pk_hi, th_o])
        u_lo = jnp.concatenate([pk_lo, tl_o])
        u_hi, u_lo = ops.sort_by_key2(u_hi, u_lo)
        ub = ops.run_boundaries(u_hi, u_lo)
        useg = ops.segment_ids(ub)
        tgt_u = jnp.where(ub, useg, cap_n)
        node_hi = jnp.full(cap_n, KEY_MAX).at[tgt_u].set(u_hi, mode="drop")
        node_lo = jnp.full(cap_n, KEY_MAX).at[tgt_u].set(u_lo, mode="drop")
        node_valid = ~((node_hi == KEY_MAX) & (node_lo == KEY_MAX))

        def join(a_hi, a_lo, values, default):
            idx = ops.searchsorted2(a_hi, a_lo, node_hi, node_lo, "left")
            idx_c = jnp.minimum(idx, a_hi.shape[0] - 1)
            hit = (a_hi[idx_c] == node_hi) & (a_lo[idx_c] == node_lo)
            return jnp.where(hit & node_valid, values[idx_c], default)

        cnt_pref = join(pk_hi, pk_lo, occ_cnt, 0)
        ext_d = join(pk_hi, pk_lo, ext_distinct, 0)
        in_d = join(sk2_hi, sk2_lo, in_distinct, 0)
        pred = join(sk2_hi, sk2_lo, pred_of_seg, 0).astype(jnp.uint8)
        t_l = ops.searchsorted2(th_o, tl_o, node_hi, node_lo, "left")
        t_r = ops.searchsorted2(th_o, tl_o, node_hi, node_lo, "right")
        tail_mult = jnp.where(node_valid, (t_r - t_l).astype(I32), 0)
        hh_o = jnp.where(hown, hh, KEY_MAX)
        hl_o = jnp.where(hown, hl, KEY_MAX)
        hh_o, hl_o = jax.lax.sort((hh_o, hl_o), num_keys=2)
        h_idx = ops.searchsorted2(hh_o, hl_o, node_hi, node_lo, "left")
        h_c = jnp.minimum(h_idx, hh_o.shape[0] - 1)
        head_member = (
            (hh_o[h_c] == node_hi) & (hl_o[h_c] == node_lo) & node_valid
        )
        cnt = jnp.where(node_valid, cnt_pref + tail_mult, 0)
        multi_out = node_valid & ((ext_d >= 2) | (tail_mult > 0))
        multi_in = node_valid & ((in_d >= 2) | head_member)

        # ---- units + global coordinates ----
        sown = _dest_split(sh_, sl_, 2 * k, splitters16, split_c) == r
        su_hi = jnp.where(sown, sh_, KEY_MAX)
        su_lo = jnp.where(sown, sl_, KEY_MAX)
        u2_hi = jnp.concatenate([node_hi, su_hi])
        u2_lo = jnp.concatenate([node_lo, su_lo])
        is_spec = jnp.concatenate(
            [jnp.zeros(cap_n, I32), jnp.ones(n_spec, I32)]
        )
        size = jnp.concatenate(
            [cnt, jnp.where(sown, 1, 0).astype(I32)]
        )
        src = jnp.arange(cap_n + n_spec, dtype=I32)
        u2_hi, u2_lo, is_spec_s, size_s, src_s = jax.lax.sort(
            (u2_hi, u2_lo, is_spec, size, src), num_keys=3, is_stable=True
        )
        # coordinates are LOCAL to this device's BWT segment (int32);
        # the int64 global segment bases live on the host only
        local_total = jnp.sum(size_s)
        start = ops.exclusive_cumsum(size_s)
        node_sel = src_s < cap_n
        node_start = jnp.zeros(cap_n, I32).at[
            jnp.where(node_sel, src_s, cap_n)
        ].set(start, mode="drop")
        spec_bwtpos = jnp.full(n_spec, -1, I32).at[
            jnp.where(node_sel, n_spec, src_s - cap_n)
        ].set(start, mode="drop")
        spec_bwtpos = jnp.where(sown, spec_bwtpos, -1)

        # ---- flag responses through the original slot structure ----
        # slot entries are EDGE keys; node key = edge >> 2
        eh_s, el_s = ph.reshape(-1), pl.reshape(-1)
        nh_s, nl_s = ops.key2_shift_right2(eh_s, el_s)
        pad_s = (eh_s == KEY_MAX) & (el_s == KEY_MAX)
        nh_s = jnp.where(pad_s, KEY_MAX, nh_s)
        nl_s = jnp.where(pad_s, KEY_MAX, nl_s)
        nid_slot = jnp.minimum(
            ops.searchsorted2(node_hi, node_lo, nh_s, nl_s, "left"),
            cap_n - 1,
        )
        mi_resp = (multi_in[nid_slot] & ~pad_s).reshape(n, cap_e)
        mo_resp = (multi_out[nid_slot] & ~pad_s).reshape(n, cap_e)
        # node reference: owner in high bits, local index in low bits
        ref_resp = jnp.where(
            pad_s, INV32, (nid_slot.astype(U32) * n + r.astype(U32))
        ).reshape(n, cap_e)
        mi_b = _a2a(mi_resp)
        mo_b = _a2a(mo_resp)
        ref_b = _a2a(ref_resp)
        pos_b = _a2a(ppos)  # positions echo back in the same slots

        return (
            node_hi[None], node_lo[None], cnt[None], multi_in[None],
            multi_out[None], pred[None], node_start[None],
            spec_bwtpos[None], mi_b[None], mo_b[None], ref_b[None],
            pos_b[None],
        )

    (node_hi, node_lo, cnt, multi_in, multi_out, pred, node_start,
     spec_bwtpos, mi_b, mo_b, ref_b, pos_b) = s1(
        x2_d, dist_d, th, tl, hh, hl, sh_, sl_
    )

    # tail-position flags: flags of the n_reads tail nodes, combined
    # across owners IN-JIT — stay on device, replicated (no host sync
    # between S1 and S2)
    tail_mi_rep, tail_ref_rep = _gather_key_flags(
        mesh, node_hi, node_lo, multi_in, multi_out, tailq_hi, tailq_lo, n
    )

    # ---------------- S2: text-side classification ----------------
    # separators before each shard's start: lets s2 recover the READ
    # INDEX of a tail position on device (base + local separator
    # cumsum), so the per-read tail flags never round-trip the host
    sep_base = np.searchsorted(
        coll.sep, np.arange(n, dtype=np.int64) * Ns
    ).astype(np.int32)

    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(
            P("d"), P("d"), P("d"), P("d"), P("d"), P("d"), P("d"),
            P("d"), P(), P(),
        ),
        out_specs=(P("d"), P("d"), P("d"), P("d"), P("d")),
    )
    def s2(x2, dist, sbm, mi_b, mo_b, ref_b, pos_b, sb, tmi_r, tref_r):
        x2, dist, sbm = x2[0], dist[0], sbm[0]
        mi_b, mo_b, ref_b, pos_b = mi_b[0], mo_b[0], ref_b[0], pos_b[0]
        Ns_l = dist.shape[0]
        # read index of each position: shard base + local separator
        # exclusive-cumsum (separators sit at read ENDS, so the count
        # of separators before a tail position IS its read index)
        is_sep_l = (dist == 0).astype(I32)
        read_id = jnp.minimum(
            sb[0] + jnp.cumsum(is_sep_l) - is_sep_l, n_reads - 1
        )
        t_mi = tmi_r[read_id]
        t_ref = tref_r[read_id]
        # positions echo back shard-local (the echo lands on the shard
        # that sent them, so no rebasing is needed)
        local = pos_b.reshape(-1)
        tgt = jnp.where(local >= 0, local, Ns_l)
        mi_pos = jnp.zeros(Ns_l, bool).at[tgt].set(
            mi_b.reshape(-1), mode="drop"
        )
        mo_pos = jnp.zeros(Ns_l, bool).at[tgt].set(
            mo_b.reshape(-1), mode="drop"
        )
        ref_pos = jnp.full(Ns_l, INV32, U32).at[tgt].set(
            ref_b.reshape(-1), mode="drop"
        )
        # merge tail-position flags (tails are multi-out by definition;
        # their multi_in/node-ref come from the owner gather)
        is_tailp = dist == k
        mi_pos = jnp.where(is_tailp, t_mi, mi_pos)
        mo_pos = jnp.where(is_tailp, True, mo_pos)
        ref_pos = jnp.where(is_tailp, t_ref, ref_pos)
        is_main = dist >= k
        is_sp = (is_main & mo_pos) | sbm
        is_blue = is_main & mi_pos
        l_sp = jnp.sum(is_sp.astype(I32))
        l_blue = jnp.sum(is_blue.astype(I32))
        return (
            is_sp[None], is_blue[None], ref_pos[None],
            l_sp[None], l_blue[None],
        )

    is_sp_d, is_blue_d, ref_pos_d, l_sp_d, l_blue_d = s2(
        x2_d, dist_d, sb_d, mi_b, mo_b, ref_b, pos_b,
        dev(sep_base), tail_mi_rep, tail_ref_rep,
    )
    # ONE batched fetch covers everything the host needs before S3:
    # spec ownership + counts (S3 stitch) and the SP/blue totals
    # (static caps for s2b)
    spec_bwtpos_h, cnt_h, l_sp_h, l_blue_h = _fetch(
        (spec_bwtpos, cnt, l_sp_d, l_blue_d)
    )
    # owners hold the local coordinate; non-owners hold -1. Every
    # special must be owned by exactly one device.
    spec_owned_h = spec_bwtpos_h >= 0
    assert (spec_owned_h.sum(axis=0) == 1).all()
    cap_sp = _pow2(max(1, int(l_sp_h.max())))
    cap_blue = _pow2(max(1, int(l_blue_h.max())))
    L_total = int(l_sp_h.sum())

    # ---------------- S2b: SP stream + blue messages ----------------
    # the '$' tail-window position as a (shard, local) pair
    dollar_shard = (N - 1 - k) // Ns
    dollar_local = (N - 1 - k) % Ns

    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(
            P("d"), P("d"), P("d"), P("d"), P("d"), P("d"), P("d"), P("d"),
        ),
        out_specs=(P("d"), P("d"), P("d"), P("d"), P("d")),
    )
    def s2b(x2, dist, is_sp, is_blue, ref_pos, l_sp, pc, ps):
        x2, dist = x2[0], dist[0]
        is_sp, is_blue, ref_pos = is_sp[0], is_blue[0], ref_pos[0]
        pc, ps = pc[0], ps[0]
        r = jax.lax.axis_index("d")
        Ns_l = dist.shape[0]
        sp_base, _L = exclusive_scan_i32(l_sp[0])
        (spi,) = jnp.nonzero(is_sp, size=cap_sp, fill_value=Ns_l)
        spi = spi.astype(I32)
        at = jnp.minimum(spi + k, x2.shape[0] - 1)
        base_c = x2[at].astype(jnp.uint8)
        d_at = dist[jnp.minimum(spi, Ns_l - 1)]
        is_sepc = d_at == k
        # the '$' tail window identified by (shard, local) — global
        # positions never materialize on device
        is_dollar = is_sepc & (r == dollar_shard) & (spi == dollar_local)
        sp6 = jnp.where(
            is_sepc, jnp.where(is_dollar, 5, 4), base_c
        ).astype(jnp.uint8)
        sp6 = jnp.where(jnp.arange(cap_sp) < l_sp[0], sp6, 0)

        (bli,) = jnp.nonzero(is_blue, size=cap_blue, fill_value=Ns_l)
        bli = bli.astype(I32)
        bval = jnp.arange(cap_blue) < jnp.sum(is_blue.astype(I32))
        # spidx: local searchsorted + base (next shard's first event if
        # past the local tail); int32 — L_total < 2^31 asserted below
        sidx = jnp.searchsorted(spi[: cap_sp], bli, side="left").astype(I32)
        sidx = jnp.minimum(sidx, l_sp[0]) + sp_base
        ref = ref_pos[jnp.minimum(bli, Ns_l - 1)]
        prev = jnp.maximum(bli - 1, 0)
        pchar = jnp.where(bli == 0, pc, x2[prev]).astype(jnp.uint8)
        prev_sep = jnp.where(bli == 0, ps, dist[prev] == 0)
        char6 = jnp.where(
            (r == 0) & (bli == 0),
            jnp.uint8(5),
            jnp.where(prev_sep, jnp.uint8(4), pchar),
        )
        # route to node owner = ref % n
        owner = jnp.where(bval, (ref % n).astype(I32), n)
        b_ref, b_sidx, b_char = _pack_by_dest(
            owner, bval, cap_blue, n,
            (ref, INV32), (sidx, jnp.int32(0)),
            (char6, jnp.uint8(0)),
        )
        b_ref = _a2a(b_ref)
        b_sidx = _a2a(b_sidx)
        b_char = _a2a(b_char)
        return sp6[None], b_ref[None], b_sidx[None], b_char[None], sp_base[None]

    sp6_d, b_ref_d, b_sidx_d, b_char_d, _sp_base = s2b(
        x2_d, dist_d, is_sp_d, is_blue_d, ref_pos_d,
        l_sp_d, pc_d, ps_d,
    )

    # ---------------- S2c: block-shard the SP stream + rank it ----------------
    # The SP string and its rank array stay sharded across the mesh
    # (the reference's per-thread SP segments + stitch,
    # src/generateSP.c:273-415); the replicated ranker is only the
    # fallback if a sample-sort partition overflows.
    assert L_total < (1 << 31)
    Pb = _pow2(max(16, -(-L_total // n)))
    cap_q = n * cap_blue

    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("d"), P("d")), out_specs=P("d"),
    )
    def s2c(sp6, l_sp):
        sp6 = sp6[0]
        r = jax.lax.axis_index("d")
        sp_base, _ = exclusive_scan_i32(l_sp[0])
        j = jnp.arange(cap_sp, dtype=I32)
        gidx = sp_base + j
        val = j < l_sp[0]
        dest = jnp.where(val, gidx // Pb, n)
        capc = min(Pb, cap_sp)
        ch, gx = _pack_by_dest(
            dest, val, capc, n, (sp6, jnp.uint8(0)), (gidx, jnp.int32(-1)),
        )
        ch, gx = _a2a(ch), _a2a(gx)
        ch, gx = ch.reshape(-1), gx.reshape(-1)
        loc = jnp.where(gx >= 0, gx - r.astype(I32) * Pb, Pb)
        blk = jnp.zeros(Pb, jnp.uint8).at[loc].set(ch, mode="drop")
        return blk[None]

    sp6_blk = s2c(sp6_d, l_sp_d)
    from debwt_tpu.parallel.sprank import sp_ranks_sharded

    rank_blk = sp_ranks_sharded(mesh, sp6_blk, L_total)

    if rank_blk is not None:
        # distributed rank lookup for the blue entries (echo pattern:
        # queries routed to rank-block owners, responses scattered
        # back by slot id)
        @functools.partial(jax.jit, static_argnames=())
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P("d"), P("d"), P("d")), out_specs=P("d"),
        )
        def s2d(rank_b, b_sidx, b_ref):
            rank_b = rank_b[0]
            q = b_sidx[0].reshape(-1).astype(I32)
            val = b_ref[0].reshape(-1) != INV32
            sid = jnp.arange(cap_q, dtype=I32)
            r = jax.lax.axis_index("d")
            dest = jnp.where(val, jnp.minimum(q, L_total - 1) // Pb, n)
            qs0, ss0 = _pack_by_dest(
                dest, val, cap_q, n, (q, jnp.int32(-1)), (sid, jnp.int32(-1)),
            )
            qs = _a2a(qs0)
            lq = jnp.where(
                qs.reshape(-1) >= 0,
                qs.reshape(-1) - r.astype(I32) * Pb, Pb,
            )
            resp = jnp.where(
                lq < Pb, rank_b[jnp.minimum(jnp.maximum(lq, 0), Pb - 1)], 0
            ).reshape(n, cap_q)
            # responses return in the source's own slot structure;
            # scatter them back by the PRE-exchange slot ids (ss0)
            resp = _a2a(resp)
            out = jnp.zeros(cap_q, I32).at[
                jnp.where(ss0.reshape(-1) >= 0, ss0.reshape(-1), cap_q)
            ].set(resp.reshape(-1), mode="drop")
            return out[None]

        b_rank_d = s2d(rank_blk, b_sidx_d, b_ref_d)
        sp6_full = sp_rank = None
    else:
        # fallback: replicated ranking (partition overflow is detected,
        # never silent — see sprank.sp_ranks_sharded)
        sp6_h = _fetch(sp6_d)
        sp6_full = np.concatenate(
            [sp6_h[r, : l_sp_h[r]] for r in range(n)]
        )
        assert sp6_full.shape[0] == L_total
        Lc = _pow2(max(1, L_total))
        sp6_ext = np.zeros(Lc, dtype=np.uint8)
        sp6_ext[:L_total] = sp6_full
        sp_rank = sp_suffix_ranks(jnp.asarray(sp6_ext), jnp.int32(L_total))
        rank_h = np.asarray(jax.device_get(sp_rank))
        sidx_h = _fetch(b_sidx_d).astype(np.int64)
        b_rank_h = rank_h[np.minimum(sidx_h, Lc - 1)].astype(np.int32)
        b_rank_d = dev(b_rank_h.reshape(n, cap_q))

    # ---------------- S3: order + assemble segments ----------------
    # per-device segment size = sum of its unit sizes; the int64
    # segment bases exist only here (the host stitch), so BWT
    # coordinates past 2^32 never touch a device
    seg_sizes = (
        cnt_h.sum(axis=1, dtype=np.int64)
        + spec_owned_h.sum(axis=1, dtype=np.int64)
    )
    cap_seg = _pow2(max(1, int(seg_sizes.max())))

    spec_char_rep = dev(sp.spec_bwt6, rep)

    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(
            P("d"), P("d"), P("d"), P("d"), P("d"), P("d"), P("d"),
            P("d"), P(),
        ),
        out_specs=(P("d"), P("d")),
    )
    def s3(node_start, cnt, multi_in, pred, spec_bwtpos, b_ref, b_rank,
           b_char, spec_char):
        node_start, cnt, multi_in, pred = (
            node_start[0], cnt[0], multi_in[0], pred[0]
        )
        spec_bwtpos = spec_bwtpos[0]
        b_ref, rank, b_char = (
            b_ref[0].reshape(-1), b_rank[0].reshape(-1),
            b_char[0].reshape(-1),
        )
        local_total = jnp.sum(cnt) + jnp.sum(
            (spec_bwtpos >= 0).astype(I32)
        )
        # blue ordering (coordinates are all device-local int32)
        val = b_ref != INV32
        nid = jnp.where(val, (b_ref // n).astype(I32), cap_n)
        nid_s, _, char_s = jax.lax.sort(
            (nid, rank, b_char.astype(I32)), num_keys=2
        )
        Bl = nid.shape[0]
        idx = jnp.arange(Bl, dtype=I32)
        first = jnp.ones(Bl, bool).at[1:].set(nid_s[1:] != nid_s[:-1])
        seg_start = jax.lax.cummax(jnp.where(first, idx, -1))
        within = idx - seg_start
        ns_ext = jnp.concatenate([node_start, jnp.full(1, -1, I32)])
        bpos = ns_ext[jnp.minimum(nid_s, cap_n)] + within
        # assemble
        seg = jnp.zeros(cap_seg, jnp.uint8)
        case2_size = jnp.where(multi_in, 0, cnt)
        fill_char = jnp.where(multi_in, jnp.uint8(0), pred)
        run_char = ops.repeat_fill(fill_char, case2_size, cap_seg)
        run_start = ops.repeat_fill(node_start, case2_size, cap_seg)
        csum = jnp.cumsum(case2_size)
        idx2 = jnp.arange(cap_seg, dtype=I32)
        segid = jnp.searchsorted(csum, idx2, side="right").astype(I32)
        starts = csum - case2_size
        off = idx2 - starts[jnp.minimum(segid, cap_n - 1)]
        c2idx = run_start + off
        nc2 = jnp.sum(case2_size)
        c2ok = idx2 < nc2
        seg = seg.at[jnp.where(c2ok, c2idx, cap_seg)].set(
            run_char, mode="drop"
        )
        sbp = jnp.where(spec_bwtpos >= 0, spec_bwtpos, cap_seg)
        seg = seg.at[sbp].set(spec_char, mode="drop")
        seg = seg.at[jnp.where(nid_s < cap_n, bpos, cap_seg)].set(
            char_s.astype(jnp.uint8), mode="drop"
        )
        return seg[None], local_total[None]

    if DEBUG is not None:
        DEBUG.update(
            b_ref=np.asarray(jax.device_get(b_ref_d)),
            b_sidx=np.asarray(jax.device_get(b_sidx_d)),
            b_char=np.asarray(jax.device_get(b_char_d)),
            b_rank=np.asarray(jax.device_get(b_rank_d)),
            sp6_blk=np.asarray(jax.device_get(sp6_blk)),
            sharded_rank=rank_blk is not None,
            node_hi=np.asarray(jax.device_get(node_hi)),
            node_lo=np.asarray(jax.device_get(node_lo)),
            cnt=cnt_h,
            node_start=np.asarray(jax.device_get(node_start)),
            multi_in=np.asarray(jax.device_get(multi_in)),
            is_blue=np.asarray(jax.device_get(is_blue_d)),
            is_sp=np.asarray(jax.device_get(is_sp_d)),
            ref_pos=np.asarray(jax.device_get(ref_pos_d)),
        )
    seg_d, seg_total_d = s3(
        node_start, cnt, multi_in, pred, spec_bwtpos,
        b_ref_d, b_rank_d, b_char_d, spec_char_rep,
    )
    seg_h, totals = _fetch((seg_d, seg_total_d))
    totals = totals.reshape(-1)
    assert (totals == seg_sizes).all()
    bwt6 = np.concatenate([seg_h[r, : totals[r]] for r in range(n)])
    assert bwt6.shape[0] == N
    (sharp,) = np.nonzero(bwt6 == K.SHARP)
    (dollar,) = np.nonzero(bwt6 == K.DOLLAR)
    assert dollar.shape[0] == 1, dollar
    return BwtResult(
        sharp_pos=sharp.astype(np.int64),
        dollar_pos=int(dollar[0]),
        _bwt6=bwt6,
        _n=N,
    )


def _gather_key_flags(mesh, node_hi, node_lo, multi_in, multi_out,
                      q_hi, q_lo, n):
    """Flags + node references for a small replicated query key set,
    combined across owners IN-JIT (psum/pmin) — the result stays on
    device, replicated, so no host sync point exists between S1 and
    S2 (the tunneled-backend fetch batching of docs/ROADMAP.md)."""

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P("d"), P(), P()),
        out_specs=(P(), P()),
    )
    def gather(nh, nl, mi, mo, qh, ql):
        nh, nl, mi, mo = nh[0], nl[0], mi[0], mo[0]
        r = jax.lax.axis_index("d")
        idx = ops.searchsorted2(nh, nl, qh, ql, "left")
        idx_c = jnp.minimum(idx, nh.shape[0] - 1)
        hit = (nh[idx_c] == qh) & (nl[idx_c] == ql)
        mi_q = jnp.where(hit, mi[idx_c], False)
        ref_q = jnp.where(
            hit, idx_c.astype(U32) * n + r.astype(U32), INV32
        )
        mi_all = jax.lax.psum(mi_q.astype(I32), "d") > 0
        ref_all = jax.lax.pmin(ref_q, "d")   # miss = INV32 (max u32)
        return mi_all, ref_all

    return gather(
        node_hi, node_lo, multi_in, multi_out,
        jnp.asarray(q_hi), jnp.asarray(q_lo),
    )
