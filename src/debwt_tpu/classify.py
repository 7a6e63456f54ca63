"""De Bruijn node classification + global BWT coordinates — on device.

The reference streams five sorted files through a sequential three-way
merge with per-node tag detection (mergeKmer, src/INandOut.c:159-943).
Here the same per-node facts fall out of data-parallel segment
reductions over the sorted edge array, and the sequential `storage`
coordinate counter becomes an exclusive scan over merged unit sizes:

  multi-out  = >=2 distinct extension chars in the edge multiset,
               or the node is some read's tail k-mer          (:260-277)
  multi-in   = >=2 distinct predecessor chars among in-edges,
               or the node is some read's head k-mer          (:282-343)
  cnt        = edge-occurrence count + tail multiplicity      (temp)
  case 2     = single-in: a cnt-long run of the unique pred   (:367-395)
  case 3     = multi-in: an interval ordered by the blue sort (:347-366)

Units (nodes merged with T-filled special singletons, specials after
the equal node) define the coordinate system; unit_start is the
exclusive scan of unit sizes (mergeKmer's running `storage`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from debwt_tpu import ops

U32 = jnp.uint32
I32 = jnp.int32
KEY_MAX = jnp.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k", "n_nodes_cap"))
def build_node_table(
    e_hi, e_lo,            # sorted edge keys (with duplicates), uint32[E]
    tail_hi, tail_lo,      # sorted tail k-mer keys (with dups), uint32[n]
    head_hi, head_lo,      # sorted distinct head k-mer keys, uint32[<=n]
    k: int,
    n_nodes_cap: int,
):
    """Returns the padded node table, sorted by key:
    (node_hi, node_lo, cnt, multi_in, multi_out, pred, num_nodes).
    Padding rows have key KEY_MAX/KEY_MAX and cnt 0."""
    E = e_hi.shape[0]

    # ---- prefix-grouped aggregates (node = first k chars of the edge)
    p_hi, p_lo = ops.key2_shift_right2(e_hi, e_lo)
    pb = ops.run_boundaries(p_hi, p_lo)
    pseg = ops.segment_ids(pb)
    num_p = pseg[-1] + 1
    occ_cnt = jax.ops.segment_sum(jnp.ones(E, I32), pseg, num_segments=E)
    last_char = (e_lo & 3).astype(I32)
    ext_distinct = ops.distinct_count_per_segment(pseg, last_char, E)
    # compact distinct prefix keys into [E] padded with KEY_MAX
    pk_hi = jnp.full(E, KEY_MAX)
    pk_lo = jnp.full(E, KEY_MAX)
    pk_hi = pk_hi.at[pseg].set(p_hi)  # last write per segment wins; key equal
    pk_lo = pk_lo.at[pseg].set(p_lo)

    # ---- suffix-grouped aggregates (node = last k chars of the edge)
    if 2 * k >= 32:
        s_hi = e_hi & ((jnp.uint32(1) << (2 * k - 32)) - jnp.uint32(1))
        s_lo = e_lo
        first_char = ((e_hi >> (2 * k - 32)) & 3).astype(I32)
    else:
        s_hi = jnp.zeros_like(e_hi)
        s_lo = e_lo & ((jnp.uint32(1) << (2 * k)) - jnp.uint32(1))
        first_char = ((e_lo >> (2 * k)) & 3).astype(I32)
    s_hi, s_lo, first_char = ops.sort_by_key2(s_hi, s_lo, first_char)
    sb = ops.run_boundaries(s_hi, s_lo)
    sseg = ops.segment_ids(sb)
    in_distinct = ops.distinct_count_per_segment(sseg, first_char, E)
    pred_of_seg = jax.ops.segment_min(first_char, sseg, num_segments=E)
    sk_hi = jnp.full(E, KEY_MAX)
    sk_lo = jnp.full(E, KEY_MAX)
    sk_hi = sk_hi.at[sseg].set(s_hi)
    sk_lo = sk_lo.at[sseg].set(s_lo)

    # ---- node universe: distinct(prefixes U tails)
    u_hi = jnp.concatenate([pk_hi, tail_hi])
    u_lo = jnp.concatenate([pk_lo, tail_lo])
    u_hi, u_lo = ops.sort_by_key2(u_hi, u_lo)
    ub = ops.run_boundaries(u_hi, u_lo)
    useg = ops.segment_ids(ub)
    node_hi = jnp.full(n_nodes_cap, KEY_MAX)
    node_lo = jnp.full(n_nodes_cap, KEY_MAX)
    node_hi = node_hi.at[useg].set(u_hi, mode="drop")
    node_lo = node_lo.at[useg].set(u_lo, mode="drop")
    num_nodes_incl_pad = useg[-1] + 1
    # KEY_MAX padding rows form one trailing segment; exclude it when
    # any padding exists (pk arrays always contain KEY_MAX rows unless
    # E == num_prefixes and tails add nothing — then no pad segment).
    has_pad = (node_hi[num_nodes_incl_pad - 1] == KEY_MAX) & (
        node_lo[num_nodes_incl_pad - 1] == KEY_MAX
    )
    num_nodes = num_nodes_incl_pad - has_pad.astype(I32)

    # ---- join aggregates onto the node table
    def join(src_hi, src_lo, values, default):
        idx = ops.searchsorted2(src_hi, src_lo, node_hi, node_lo, "left")
        idx_c = jnp.minimum(idx, src_hi.shape[0] - 1)
        hit = (src_hi[idx_c] == node_hi) & (src_lo[idx_c] == node_lo)
        return jnp.where(hit, values[idx_c], default)

    cnt_pref = join(pk_hi, pk_lo, occ_cnt, 0)
    ext_d = join(pk_hi, pk_lo, ext_distinct, 0)
    in_d = join(sk_hi, sk_lo, in_distinct, 0)
    pred = join(sk_hi, sk_lo, pred_of_seg, 0).astype(jnp.uint8)

    # tail multiplicity / membership
    t_left = ops.searchsorted2(tail_hi, tail_lo, node_hi, node_lo, "left")
    t_right = ops.searchsorted2(tail_hi, tail_lo, node_hi, node_lo, "right")
    tail_mult = (t_right - t_left).astype(I32)
    # head membership
    h_idx = ops.searchsorted2(head_hi, head_lo, node_hi, node_lo, "left")
    h_idx_c = jnp.minimum(h_idx, head_hi.shape[0] - 1)
    head_member = (head_hi[h_idx_c] == node_hi) & (head_lo[h_idx_c] == node_lo)

    valid = jnp.arange(n_nodes_cap, dtype=I32) < num_nodes
    cnt = jnp.where(valid, cnt_pref + tail_mult, 0)
    multi_out = valid & ((ext_d >= 2) | (tail_mult > 0))
    multi_in = valid & ((in_d >= 2) | head_member)
    return node_hi, node_lo, cnt, multi_in, multi_out, pred, num_nodes


@functools.partial(jax.jit, static_argnames=())
def build_units(
    node_hi, node_lo, cnt, multi_in, pred,
    spec_hi, spec_lo,      # T-filled special keys, in true special order
    spec_char6,            # uint8 special BWT chars, same order
):
    """Merge nodes with special singletons and assign BWT coordinates.

    Returns (node_start, spec_bwtpos, unit_size, unit_fill):
    absolute BWT block starts per node, absolute BWT positions per
    special suffix, plus the merged unit sequence itself — unit order
    IS BWT order, so `repeat(unit_fill, unit_size)` lays down every
    case-2 run and special char in place (case-3 slots carry 0 and are
    overwritten by the blue scatter).

    Specials tie-break AFTER the node with the equal T-filled key
    (reference: the specialBwt interleave runs after the node's block,
    src/INandOut.c:418-439), and among themselves by their true order —
    encoded here as a stable 3-key sort with is_special as the tie key.
    """
    cap_nodes = node_hi.shape[0]
    n_spec = spec_hi.shape[0]
    u_hi = jnp.concatenate([node_hi, spec_hi])
    u_lo = jnp.concatenate([node_lo, spec_lo])
    is_spec = jnp.concatenate(
        [jnp.zeros(cap_nodes, I32), jnp.ones(n_spec, I32)]
    )
    size = jnp.concatenate([cnt, jnp.ones(n_spec, I32)])
    fill = jnp.concatenate(
        [jnp.where(multi_in, jnp.uint8(0), pred), spec_char6]
    )
    src = jnp.arange(cap_nodes + n_spec, dtype=I32)
    # stable sort keeps specials in their incoming (true) order
    u_hi, u_lo, is_spec, size, fill, src = jax.lax.sort(
        (u_hi, u_lo, is_spec, size, fill, src), num_keys=3, is_stable=True
    )
    start = ops.exclusive_cumsum(size)
    node_sel = src < cap_nodes
    # masked scatters: out-of-range indices are dropped
    node_start = jnp.zeros(cap_nodes, I32).at[
        jnp.where(node_sel, src, cap_nodes)
    ].set(start.astype(I32), mode="drop")
    spec_bwtpos = jnp.zeros(n_spec, I32).at[
        jnp.where(node_sel, n_spec, src - cap_nodes)
    ].set(start.astype(I32), mode="drop")
    return node_start, spec_bwtpos, size, fill
