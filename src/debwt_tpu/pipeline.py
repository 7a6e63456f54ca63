"""Single-chip end-to-end pipeline orchestration.

Stage boundaries mirror the reference driver (src/main.c:83-160) but
the interfaces are device arrays instead of temp files, and the only
host syncs are the dynamic-size reductions (number of SP events, blue
entries) that size the next stage's static shapes — the TPU analogue
of the reference's cross-stage globals (case3num, blueCapacity, ...).

Capacities are rounded up to powers of two so recompiles are rare
across inputs of similar scale.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from debwt_tpu import assemble, bluesort, classify, count, ops, spcode
from debwt_tpu import constants as K
from debwt_tpu.special import build_special
from debwt_tpu.types import PipelineConfig, SequenceCollection


@dataclasses.dataclass(frozen=True)
class BwtResult:
    bwt6: np.ndarray
    sharp_pos: np.ndarray
    dollar_pos: int

    @property
    def bwt2(self) -> np.ndarray:
        out = self.bwt6.copy()
        out[out >= 4] = K.T
        return out

    def packed(self) -> bytes:
        from debwt_tpu.golden import pack_2bit_u64

        return pack_2bit_u64(self.bwt2)


def _pow2(x: int) -> int:
    return max(16, 1 << (int(x) - 1).bit_length())


def _split64(key64: np.ndarray):
    return (
        (key64 >> np.uint64(32)).astype(np.uint32),
        (key64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )


def build_bwt(
    coll: SequenceCollection, config: PipelineConfig | None = None
) -> BwtResult:
    config = config or PipelineConfig()
    m = config.m
    k = config.k
    N = coll.bwt_len
    n = coll.n_reads
    if N >= 2**31 - K.TAIL_PAD and not config.use_x64:
        raise NotImplementedError(
            "int32 pipeline: text must be < 2^31; enable use_x64 (3 Gbp tier)"
        )

    # ---- host: ingest + special module (tiny, irregular) ----
    sp = build_special(coll, m)
    x2p = np.concatenate(
        [coll.x2, np.full(K.TAIL_PAD, K.T, dtype=np.uint8)]
    )

    d_x2p = jnp.asarray(x2p)
    d_sep = jnp.asarray(coll.sep.astype(np.int32))
    dist = count.distance_to_separator(d_sep, jnp.zeros(N, jnp.int32))

    # ---- device: edge extraction + sort (Jellyfish + mySort) ----
    n_edges = N - n * m
    e_hi, e_lo, _e_pos = count.extract_and_sort_edges(d_x2p, dist, m, n_edges)

    # ---- device: node table (getKmer + mergeKmer tags) ----
    tail_hi, tail_lo = _split64(sp.tail_keys)
    head_hi, head_lo = _split64(sp.head_keys)
    cap_nodes = n_edges + n + 1
    node_hi, node_lo, cnt, multi_in, multi_out, pred, num_nodes = (
        classify.build_node_table(
            e_hi, e_lo,
            jnp.asarray(tail_hi), jnp.asarray(tail_lo),
            jnp.asarray(head_hi), jnp.asarray(head_lo),
            k, cap_nodes,
        )
    )

    # ---- device: units + coordinates (mergeKmer `storage`) ----
    s_hi, s_lo = _split64(sp.spec_tfill)
    node_start, spec_bwtpos = classify.build_units(
        node_hi, node_lo, cnt, multi_in, jnp.asarray(s_hi), jnp.asarray(s_lo)
    )

    # ---- device: position classification (generateSP scan) ----
    spec_branch_mask = np.zeros(N, dtype=bool)
    spec_branch_mask[sp.spec_branch_pos] = True
    is_sp, is_blue, node_id = spcode.classify_positions(
        d_x2p, dist,
        node_hi, node_lo, multi_in, multi_out,
        jnp.asarray(spec_branch_mask), k,
    )
    L = int(jnp.sum(is_sp))
    B = int(jnp.sum(is_blue))
    L_cap, B_cap = _pow2(L), _pow2(B)

    sp_pos, sp6, blue_node, blue_spidx, blue_char6 = spcode.build_sp_and_blue(
        d_x2p, dist, is_sp, is_blue, node_id, d_sep, k, L_cap, B_cap, n
    )
    # mask padding: nonzero pads with 0s -> fake entries at position 0.
    # Slice to exact counts on device (cheap static-size ops follow).
    sp6 = jnp.where(jnp.arange(L_cap) < L, sp6, 0)

    # ---- device: SP suffix ranks (sortBlue/cmpSP, batched) ----
    sp6_ext = jnp.concatenate([sp6, jnp.zeros(L_cap, jnp.uint8)])
    sp_rank = bluesort.sp_suffix_ranks(sp6_ext)[: L_cap]

    # blue padding entries: route to an out-of-range node id so they
    # sort to the tail and scatter out of range (dropped)
    blue_valid = jnp.arange(B_cap) < B
    blue_node = jnp.where(blue_valid, blue_node, cap_nodes)
    blue_pos_abs, blue_sorted_char = bluesort.order_blue(
        blue_node, jnp.minimum(blue_spidx, L_cap - 1), blue_char6,
        sp_rank, jnp.concatenate([node_start, jnp.full(1, N, jnp.int32)]),
    )

    # ---- device: assembly (insertCase3) ----
    bwt6 = assemble.assemble_bwt6(
        node_start, cnt, multi_in, pred,
        spec_bwtpos, jnp.asarray(sp.spec_bwt6),
        blue_pos_abs, blue_sorted_char, N,
    )
    sharp, dollar = assemble.extract_sidecars(bwt6, n)

    bwt6_h = np.asarray(jax.device_get(bwt6))
    if config.check:
        counts = np.bincount(bwt6_h, minlength=6)
        want = np.bincount(coll.x6, minlength=6)
        assert (counts == want).all(), (counts, want)
    return BwtResult(
        bwt6=bwt6_h,
        sharp_pos=np.asarray(jax.device_get(sharp)).astype(np.int64),
        dollar_pos=int(dollar),
    )
