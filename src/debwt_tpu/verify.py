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


def lf_verify(result, coll) -> bool:
    """Walk the BWT backwards from '$' and compare against the text.
    Returns True iff the reconstruction matches exactly."""
    bwt6 = result.bwt6
    n = bwt6.shape[0]
    counts = np.bincount(bwt6, minlength=6)
    cum = np.zeros(7, dtype=np.int64)
    np.cumsum(counts, out=cum[1:])
    ranks = np.zeros(n, dtype=np.int64)
    for c in range(6):
        mask = bwt6 == c
        ranks[mask] = np.arange(int(mask.sum()), dtype=np.int64)
    x6 = coll.x6
    i = result.dollar_pos
    for pos in range(n - 1, -1, -1):
        c = bwt6[i]
        if x6[pos] != c:
            return False
        i = int(cum[c] + ranks[i])
    return True
