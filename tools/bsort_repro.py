#!/usr/bin/env python3
"""Minimal repro for the bitonic-sort cross-executable crash.

Round-3/4 observation (kernels/bsort.py header): the Pallas bitonic
sort is green in EVERY single-program configuration, but crashes with
INVALID_ARGUMENT on the SECOND pipeline call when BOTH of these hold:

  (a) executable A carries window_keys + seg_or Pallas kernels AND a
      bitonic sort (the stage_graph shape), and
  (b) executable B carries any bitonic sort (the stage_finish shape),

alternating A, B, A. This script is the smallest standalone form of
that pattern: run it on a real TPU; exit 0 = the runtime no longer
exhibits the interference, non-zero/crash = repro'd (capture stderr).

Usage: PYTHONPATH=/root/.axon_site python tools/bsort_repro.py [R_log2]

NOTE (round 5): kernels/bsort.py was removed from the tree
(docs/BSORT_POSTMORTEM.md) — run this script from a checkout that
predates the removal (any round-4 commit). Both minimal variants ran
GREEN on 2026-08-21 while the full-pipeline configuration
(DEBWT_SORT_MIN_PALLAS=1 bench.py, same checkout) still crashed — the
matrix is in the postmortem.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    r_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    R = 1 << r_log2
    from debwt_tpu.kernels.bsort import bitonic_sort
    from debwt_tpu.kernels.seg_or import seg_suffix_or
    from debwt_tpu.kernels.window_keys import window_keys_pallas

    @functools.partial(jax.jit, static_argnames=("n",))
    def prog_a(x2, ord_, f8, n):
        # the stage_graph kernel mix: window keys + seg-or + bitonic
        hi, lo = window_keys_pallas(x2, 31, n)
        orb = seg_suffix_or(
            (lo & 63).astype(jnp.int32) | (1 << 6)
        )
        hi2, lo2, o2, f2 = bitonic_sort(
            (hi, lo, ord_, f8), num_keys=3
        )
        return (
            jnp.sum(orb), hi2[0], lo2[0],
            jnp.sum(o2.astype(jnp.uint32)), jnp.sum(f2),
        )

    @jax.jit
    def prog_b(keys):
        # the stage_finish shape: a bare bitonic sort
        (s,) = bitonic_sort((keys,), num_keys=1)
        return s[0], s[-1], jnp.sum(s)

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.integers(0, 4, size=R + 40).astype(np.uint8))
    ordv = jnp.asarray(rng.permutation(R).astype(np.uint32))
    f8 = jnp.asarray(rng.integers(0, 32, size=R).astype(np.uint32))
    keys = jnp.asarray(
        rng.integers(0, 2**32, size=R, dtype=np.uint64).astype(np.uint32)
    )

    want_b = np.sort(np.asarray(keys))
    for i in range(3):
        ra = jax.block_until_ready(prog_a(x2, ordv, f8, R))
        rb = jax.block_until_ready(prog_b(keys))
        assert int(rb[0]) == int(want_b[0]) and int(rb[1]) == int(want_b[-1])
        print(f"round {i}: A={[int(v) for v in ra]} "
              f"B=({int(rb[0])}, {int(rb[1])})", flush=True)
    print("NO CRASH: cross-executable alternation is green on this "
          "runtime", flush=True)


if __name__ == "__main__":
    main()
