"""Distributed SP suffix ranking: sample-sort prefix tripling.

The reference keeps SP work partitioned per thread and stitches the
per-thread streams afterwards (src/generateSP.c:273-415); its blue
sort then compares SP suffixes on demand (src/sortBlue.c:109-173).
The TPU-native analogue ranks ALL SP suffixes up front (one batched
computation instead of comparator calls), and this module does that
WITHOUT ever materializing the SP string or its rank array on one
device: both stay block-sharded across the mesh for the whole
computation.

Algorithm: the engine's prefix-tripling rank loop
(engine._suffix_ranks) lifted to a 1-D device mesh. Each round covers
prefix length 3h and needs

  1. lookaheads rank[i+h], rank[i+2h] — contiguous global shifts of a
     block-sharded array = log2(n) conditional power-of-two
     `ppermute`s + one dynamic slice (never a random gather). h is a
     TRACED scalar, so every tripling round runs the same single
     compiled program — tie depth costs rounds, not compiles;
  2. a GLOBAL sort of (rank, rank+h, rank+2h, idx) tuples — a sample
     sort: local sort, splitters from an all_gathered sample,
     `all_to_all` routing by splitter range, local re-sort. Keys are
     made globally unique by the trailing idx, so equal-depth
     splitters over the sample balance partitions regardless of tie
     mass (no hot-key skew: duplicates of (rank, r2, r3) still differ
     in idx and split across devices);
  3. dense re-ranking — segment boundaries with a cross-device
     last-tuple handoff, then a collective exclusive scan;
  4. routing ranks back to their position blocks (`idx // Pb` is the
     owner — capacity exactly Pb, overflow-free by construction).

Per-round host sync is two scalars (overflow flag, all-distinct flag);
the arrays never leave the devices. Partition overflow (a sampling
tail event, bounded by the 2x slack on cap_r) is detected, never
silent: sp_ranks_sharded returns None and the caller falls back to
the replicated ranker.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from debwt_tpu.parallel.collectives import (
    a2a, exclusive_scan_i32, pack_by_dest,
)

I32 = jnp.int32
BIGK = jnp.int32(2**31 - 1)   # sort-to-tail sentinel for routed pads
shard_map = jax.shard_map


def _blk_shift_left(x, q, n: int):
    """Block left-shift by TRACED q blocks over the 1-D mesh axis:
    device i ends up with device i+q's block (devices past the edge
    hold garbage — callers mask by global index). Decomposed into
    log2(n) conditional power-of-two ppermutes so the communication
    pattern stays static while the distance is data."""
    j = 1
    while j < n:
        dist = j

        def do(x, dist=dist):
            return jax.lax.ppermute(
                x, "d", [(i + dist, i) for i in range(n - dist)]
            )

        x = jax.lax.cond((q & j) != 0, do, lambda x: x, x)
        j *= 2
    return x


def _shift_left(rank, h, gi, L, n: int, Pb: int):
    """Global left-shift by TRACED h of a block-sharded array:
    out[j] = global_rank[gi[j] + h], or -1 past L. Sources are blocks
    r+q and r+q+1 (q = h // Pb): two dynamic block shifts + one
    dynamic slice. h is data, not program structure — every tripling
    round reuses ONE compiled program."""
    q = h // Pb
    off = h - q * Pb
    a = _blk_shift_left(rank, q, n)
    b = _blk_shift_left(rank, q + 1, n)
    res = jax.lax.dynamic_slice(
        jnp.concatenate([a, b]), (off,), (Pb,)
    )
    # any lane whose source block fell off the mesh edge has
    # gi + h >= n*Pb >= L, so the mask also covers the garbage lanes
    return jnp.where(gi + h < L, res, -1)


def _lex_gt4(a1, a2, a3, a4, b1, b2, b3, b4):
    """(a1,a2,a3,a4) > (b1,b2,b3,b4) lexicographically, vectorized."""
    return (
        (a1 > b1)
        | ((a1 == b1) & (a2 > b2))
        | ((a1 == b1) & (a2 == b2) & (a3 > b3))
        | ((a1 == b1) & (a2 == b2) & (a3 == b3) & (a4 > b4))
    )


@functools.lru_cache(maxsize=64)
def _make_round(mesh: Mesh, n: int, Pb: int, n_samp: int, cap_r: int):
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("d"), P(), P()),
        out_specs=(P("d"), P(), P()),
    )
    def round_fn(rank_blk, L, h):
        rank = rank_blk[0]
        r = jax.lax.axis_index("d")
        gi = r.astype(I32) * Pb + jnp.arange(Pb, dtype=I32)
        r2 = _shift_left(rank, h, gi, L, n, Pb)
        r3 = _shift_left(rank, 2 * h, gi, L, n, Pb)

        # --- local sort + splitter sample (keys unique via gi) ---
        k1, k2, k3, k4 = jax.lax.sort((rank, r2, r3, gi), num_keys=4)
        sidx = ((jnp.arange(n_samp, dtype=I32) + 1) * Pb) // (n_samp + 1)
        samp = jnp.stack([k1[sidx], k2[sidx], k3[sidx], k4[sidx]])  # (4,s)
        allsamp = jax.lax.all_gather(samp, "d")       # (n, 4, s)
        s1 = allsamp[:, 0].reshape(-1)
        s2 = allsamp[:, 1].reshape(-1)
        s3 = allsamp[:, 2].reshape(-1)
        s4 = allsamp[:, 3].reshape(-1)
        s1, s2, s3, s4 = jax.lax.sort((s1, s2, s3, s4), num_keys=4)
        spl = ((jnp.arange(n - 1, dtype=I32) + 1) * (n * n_samp)) // n
        p1, p2, p3, p4 = s1[spl], s2[spl], s3[spl], s4[spl]

        # --- destination = # splitters < key; route; re-sort ---
        dest = jnp.zeros(Pb, I32)
        for i in range(n - 1):
            dest = dest + _lex_gt4(
                k1, k2, k3, k4, p1[i], p2[i], p3[i], p4[i]
            ).astype(I32)
        cnt = jnp.bincount(dest, length=n)
        over = jax.lax.psum(
            jnp.any(cnt > cap_r).astype(I32), "d"
        ) > 0
        valid = jnp.ones(Pb, bool)
        b1, b2, b3, b4 = pack_by_dest(
            dest, valid, cap_r, n,
            (k1, BIGK), (k2, BIGK), (k3, BIGK), (k4, jnp.int32(-1)),
        )
        b1, b2, b3, b4 = a2a(b1), a2a(b2), a2a(b3), a2a(b4)
        q1, q2, q3, q4 = jax.lax.sort(
            (b1.reshape(-1), b2.reshape(-1), b3.reshape(-1),
             b4.reshape(-1)), num_keys=4,
        )
        realq = q4 >= 0
        n_real = jnp.sum(realq.astype(I32))

        # --- cross-device previous tuple (skip empty partitions) ---
        last_i = jnp.maximum(n_real - 1, 0)
        mine = jnp.stack([
            q1[last_i], q2[last_i], q3[last_i], n_real
        ])                                             # (4,)
        alllast = jax.lax.all_gather(mine, "d")        # (n, 4)
        has = alllast[:, 3] > 0
        before = (jnp.arange(n) < r) & has
        # index of the last non-empty device before r (or -1)
        prev_dev = jnp.max(jnp.where(before, jnp.arange(n), -1))
        any_prev = prev_dev >= 0
        pd = jnp.maximum(prev_dev, 0)
        pv1, pv2, pv3 = alllast[pd, 0], alllast[pd, 1], alllast[pd, 2]

        new = jnp.zeros(q1.shape[0], bool)
        new = new.at[1:].set(
            (q1[1:] != q1[:-1]) | (q2[1:] != q2[:-1]) | (q3[1:] != q3[:-1])
        )
        first_new = ~any_prev | (
            (q1[0] != pv1) | (q2[0] != pv2) | (q3[0] != pv3)
        )
        new = new.at[0].set(first_new)
        new = new & realq
        newc = jnp.cumsum(new.astype(I32))
        base, _ = exclusive_scan_i32(newc[-1])
        nrank = base + newc - 1
        done = jax.lax.psum(newc[-1], "d") == jnp.int32(n * Pb)

        # --- route ranks home (owner = idx // Pb; capacity exact) ---
        dest2 = jnp.where(realq, q4 // Pb, n)
        g1, g2 = pack_by_dest(
            dest2, realq, Pb, n, (nrank, jnp.int32(0)), (q4, jnp.int32(-1)),
        )
        g1, g2 = a2a(g1), a2a(g2)
        g1, g2 = g1.reshape(-1), g2.reshape(-1)
        loc = jnp.where(g2 >= 0, g2 - r.astype(I32) * Pb, Pb)
        rank_new = jnp.zeros(Pb, I32).at[loc].set(g1, mode="drop")
        return rank_new[None], over, done

    return round_fn


@functools.lru_cache(maxsize=16)
def _make_round0(mesh: Mesh, n: int, Pb: int):
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("d"), P()), out_specs=P("d"),
    )
    def round0(sp6_blk, L):
        sp6 = sp6_blk[0]
        r = jax.lax.axis_index("d")
        gi = r.astype(I32) * Pb + jnp.arange(Pb, dtype=I32)
        # 8-char halo from the next block
        halo = jax.lax.ppermute(
            sp6[:8], "d", [(i + 1, i) for i in range(n - 1)]
        )
        ext = jnp.concatenate([sp6, halo])             # (Pb + 8,)
        gi_ext = r.astype(I32) * Pb + jnp.arange(Pb + 8, dtype=I32)
        c = jnp.where(gi_ext < L, ext.astype(I32) + 1, 0)
        rank0 = jnp.zeros(Pb, I32)
        for j in range(8):
            rank0 = (rank0 << 3) | jax.lax.dynamic_slice(c, (j,), (Pb,))
        M = n * Pb
        rank0 = jnp.where(gi < L, rank0, gi - M)   # pads: distinct, negative
        return rank0[None]

    return round0


def sp_ranks_sharded(mesh: Mesh, sp6_blk, L: int, slack: int = 2):
    """Suffix ranks (order encodings) of the block-sharded SP string.

    sp6_blk: (n, Pb) uint8 device array sharded P("d") along the mesh
    axis; entries at global index >= L are ignored. Returns a (n, Pb)
    int32 rank array with the same sharding, or None if a routing
    partition overflowed its 2x-slack capacity (caller falls back to
    the replicated ranker; never silent corruption).
    """
    n = int(mesh.devices.size)
    Pb = int(sp6_blk.shape[1])
    assert n * Pb >= L, (n, Pb, L)
    L_j = jnp.int32(L)
    rank = _make_round0(mesh, n, Pb)(sp6_blk, L_j)
    n_samp = min(Pb, 1024)
    cap_r = min(n * Pb, slack * Pb)
    h = 8
    M = n * Pb
    round_fn = _make_round(mesh, n, Pb, n_samp, cap_r)  # ONE program
    while h < M:
        rank, over, done = round_fn(rank, L_j, jnp.int32(h))
        over_h, done_h = jax.device_get((over, done))   # one sync/round
        if bool(np.asarray(over_h)):
            return None
        if bool(np.asarray(done_h)):
            break
        h *= 3
    return rank
