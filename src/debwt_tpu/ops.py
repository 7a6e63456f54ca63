"""Device-side primitive ops shared by the pipeline stages.

Conventions:
  * 64-bit keys are carried as (hi, lo) uint32 pairs — TPU-native lanes,
    no global x64. key64 = sum(c_i * 4**(w-1-i)) for a w-char window,
    hi = key64 >> 32, lo = key64 & 0xffffffff.
  * sorts are jax.lax.sort with num_keys for lexicographic multi-key
    ordering (stable).
  * "segments" are runs of equal keys in sorted arrays, marked by a
    boundary flag at the first element of each run.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

U32 = jnp.uint32


def window_keys(x2: jnp.ndarray, w: int):
    """(hi, lo) uint32 keys of the w-char windows at every position.

    x2: uint8[P] 2-bit codes, already tail-padded so that reads at
    [p, p+w) are in bounds for p < P - w + 1. Returns n_out = P - w + 1
    keys; key(p) = sum_i x2[p+i] * 4**(w-1-i), low-aligned in the
    64-bit (hi, lo) pair.

    Built by logarithmic doubling: D_j[p] packs the j-char window at p
    (D_2j[p] = D_j[p] << 2j | D_j[p+j]), then w's binary decomposition
    is appended greedily — O(log w) shifted ORs instead of the naive w
    (the reference extracts windows per-position from packed u64 words,
    src/collect#$.c:243-251; on TPU contiguous shifted slices beat
    per-position word gathers).

    On TPU backends the same doubling runs as a Pallas kernel
    (kernels/window_keys.py) that keeps every intermediate in VMEM —
    one HBM pass instead of one per doubling level. DEBWT_NO_PALLAS=1
    forces this XLA fallback.
    """
    P = x2.shape[0]
    n_out = P - w + 1
    assert 1 <= w <= 32, w
    if (
        w >= 2
        and n_out >= 1
        and jax.default_backend() == "tpu"
        and os.environ.get("DEBWT_NO_PALLAS") != "1"
    ):
        from debwt_tpu.kernels.window_keys import window_keys_pallas

        return window_keys_pallas(x2, w, n_out)
    d = {1: x2.astype(U32)}
    p = 1
    while 2 * p <= min(w, 16):
        prev = d[p]
        m_len = prev.shape[0] - p
        d[2 * p] = (prev[:m_len] << (2 * p)) | prev[p : p + m_len]
        p *= 2
    parts = []
    rem = w
    for q in (16, 8, 4, 2, 1):
        while rem >= q and q in d:
            parts.append(q)
            rem -= q
    assert rem == 0, (w, parts)
    off = parts[0]
    hi = jnp.zeros(n_out, dtype=U32)
    lo = d[parts[0]][:n_out]
    for q in parts[1:]:
        chunk = d[q][off : off + n_out]
        s = 2 * q
        if s == 32:
            hi, lo = lo, chunk
        else:
            hi = (hi << s) | (lo >> (32 - s))
            lo = (lo << s) | chunk
        off += q
    return hi, lo


def sort_by_key2(hi, lo, *values):
    """Sort rows by (hi, lo) lexicographically; returns sorted
    (hi, lo, *values)."""
    return jax.lax.sort((hi, lo) + tuple(values), num_keys=2, is_stable=True)


def msort(operands, num_keys: int = 1, site: str = ""):
    """Multi-operand lexicographic sort over XLA's variadic sort.

    is_stable=False: lax.sort DEFAULTS to stable, which the msort
    contract explicitly does not promise — and XLA's stable variadic
    sort pays real memory for it (measured: the 2-operand sort at
    R = 4e8 allocates 13.5 GB of HLO temp stable vs fitting unstable,
    the difference between the single-chip tier capping at ~250 vs
    ~400 Mbp). Callers must have distinct key tuples or
    order-independent downstream semantics on ties (every engine call
    site does — the row payload operand is always distinct).

    `site` labels the call site for profiling/debug. History: rounds
    2-4 carried an opt-in Pallas bitonic route here; it measured
    slower than XLA's sort at every size and crashed on re-execution
    in the production configuration — removed in round 5
    (docs/BSORT_POSTMORTEM.md).
    """
    del site
    return jax.lax.sort(tuple(operands), num_keys=num_keys,
                        is_stable=False)


def run_boundaries(hi, lo):
    """bool[n]: True at the first element of each equal-key run."""
    first = jnp.ones(hi.shape[0], dtype=bool)
    neq = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    return first.at[1:].set(neq)


def segment_ids(boundaries):
    """int32 run index per element from boundary flags."""
    return jnp.cumsum(boundaries.astype(jnp.int32)) - 1


def searchsorted2(a_hi, a_lo, q_hi, q_lo, side: str = "left"):
    """Vectorized binary search of (q_hi, q_lo) into the sorted key-pair
    array (a_hi, a_lo). Equivalent to jnp.searchsorted on the fused
    64-bit keys. O(log n) gather rounds.
    """
    n = a_hi.shape[0]
    n_iter = max(1, (n + 1).bit_length())
    # derive the carries from the operands so their device-varying type
    # matches under shard_map (fresh constants are "unvarying")
    zero = (q_hi & jnp.uint32(0)).astype(jnp.int32) + (
        a_hi[0] & jnp.uint32(0)
    ).astype(jnp.int32)
    lo_b = zero
    hi_b = zero + n

    def less(kh, kl, qh, ql):
        if side == "left":
            # first index where a[i] >= q  -> descend left when a[mid] >= q
            return (kh > qh) | ((kh == qh) & (kl >= ql))
        # side == "right": first index where a[i] > q
        return (kh > qh) | ((kh == qh) & (kl > ql))

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        mh = a_hi[jnp.minimum(mid, n - 1)]
        ml = a_lo[jnp.minimum(mid, n - 1)]
        # positions at/past the end compare as +infinity
        go_left = (mid >= n) | less(mh, ml, q_hi, q_lo)
        hi_b = jnp.where(go_left, mid, hi_b)
        lo_b = jnp.where(go_left, lo_b, mid + 1)
        return lo_b, hi_b

    lo_b, hi_b = jax.lax.fori_loop(0, n_iter, body, (lo_b, hi_b))
    return lo_b


def ramp_from_sizes(sizes, total: int):
    """Concatenated [0..s0), [0..s1), ... as int32[total]. sizes must
    sum to total (static)."""
    starts = jnp.cumsum(sizes) - sizes
    idx = jnp.arange(total, dtype=jnp.int32)
    seg = jnp.searchsorted(jnp.cumsum(sizes), idx, side="right").astype(jnp.int32)
    return idx - starts[seg], seg


def repeat_fill(values, sizes, total: int):
    """jnp.repeat with static total length."""
    return jnp.repeat(values, sizes, total_repeat_length=total)


def distinct_count_per_segment(seg_ids, values, num_segments: int):
    """Count distinct `values` per segment. seg_ids must be grouped
    (sorted); values need not be sorted within segments. Works by
    sorting (seg, value) pairs and counting pair-boundaries."""
    order = jax.lax.sort(
        (seg_ids.astype(jnp.int32), values.astype(jnp.int32)), num_keys=2
    )
    s, v = order
    new = jnp.ones(s.shape[0], dtype=jnp.int32)
    new = new.at[1:].set(((s[1:] != s[:-1]) | (v[1:] != v[:-1])).astype(jnp.int32))
    return jax.ops.segment_sum(new, s, num_segments=num_segments)


def exclusive_cumsum(x):
    return jnp.cumsum(x) - x


def key2_shift_right2(hi, lo):
    """(hi, lo) >> 2 on the fused 64-bit key (drop the last 2-bit char)."""
    return hi >> 2, (hi << 30) | (lo >> 2)


def pack_2bit_words_host(x2):
    """NumPy host-side 2-bit pack into uint32 words (16 codes/word,
    first code in bits 31:30) — used to shrink the host->device text
    transfer 4x; ops.unpack_2bit_words inverts it on device.

    Byte-at-a-time: 4 codes OR into one uint8 (code 0 in bits 7:6),
    then the 4 bytes of each word reinterpret as a big-endian uint32 —
    ~4x less numpy traffic than a u32-widened shift-and-sum (this runs
    per build_bwt call on the host critical path at up to 512 Mbp)."""
    import numpy as np

    n = x2.shape[0]
    n_words = (n + 15) // 16
    pad = np.zeros(n_words * 16, dtype=np.uint8)
    pad[:n] = x2
    q = pad.reshape(-1, 4)
    b = (q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2) | q[:, 3]
    return b.view(">u4").astype(np.uint32)


def unpack_2bit_words(words: jnp.ndarray, n: int):
    """Device-side inverse of pack_2bit_words_host: uint32 words ->
    uint8[n] 2-bit codes."""
    shifts = (2 * (15 - jnp.arange(16, dtype=jnp.uint32))).astype(jnp.uint32)
    codes = ((words[:, None] >> shifts[None, :]) & 3).astype(jnp.uint8)
    return codes.reshape(-1)[:n]


def pack_2bit_words(codes: jnp.ndarray):
    """Pack uint8 2-bit codes into uint32 words, 16 codes/word,
    first code in bits 31:30 (matching the reference's u64 layout when
    two consecutive u32 words form one big-endian-within-word u64:
    u64 word = (w0 << 32) | w1)."""
    n = codes.shape[0]
    n_words = (n + 15) // 16
    padded = jnp.zeros(n_words * 16, dtype=jnp.uint32)
    padded = padded.at[:n].set(codes.astype(jnp.uint32))
    shifts = (2 * (15 - jnp.arange(16, dtype=jnp.uint32))).astype(jnp.uint32)
    return (padded.reshape(n_words, 16) << shifts[None, :]).sum(
        axis=1, dtype=jnp.uint32
    )
