"""Blue-block ordering via SP suffix ranks — on device.

The reference sorts each case-3 block with a comparator-driven
quicksort whose comparisons walk the SP code 32 chars at a time with
separator collation (myQsort/cmpSP, src/sortBlue.c:109-280). The
comparator reduces to plain lexicographic order over the 6-letter SP
string (see model.py), so the entire per-block comparison sort is
replaced by ONE prefix-doubling rank computation over the SP string —
O(L log L) total, batched across every block at once — followed by a
single 2-key sort of the blue entries by (node, rank).

The SP string is zero-padded ('A', matching the reference's calloc'd
tail, src/generateSP.c:220-227); within-block comparisons are always
decided before the pad can matter (the '$' marker is unique).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def sp_suffix_ranks(sp6_ext: jnp.ndarray, L_dyn=None):
    """Ranks of all suffixes of sp6_ext (uint8[M], zero-padded past the
    true length) as ORDER ENCODINGS (not dense): callers use them only
    as sort keys. Delegates to the engine's prefix-tripling rank loop
    (true-length semantics, all-distinct early exit); zero-tail and
    end-sentinel orderings coincide because 0 is the minimum char
    (first nonzero real char wins, else the shorter suffix is
    smaller)."""
    from debwt_tpu.engine import _suffix_ranks

    M = sp6_ext.shape[0]
    if L_dyn is None:
        L_dyn = jnp.int32(M)
    return _suffix_ranks(sp6_ext, L_dyn)
