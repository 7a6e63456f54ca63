#!/usr/bin/env python3
"""Per-stage TPU timing for the fused single-chip engine.

Usage: python3 tools/profile_tpu.py [mbp]
Note: on the axon platform block_until_ready does not reliably sync;
every timing below forces a scalar host fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np

from debwt_tpu import constants as K
from debwt_tpu import engine
from debwt_tpu.pipeline import _bucket, _pow2, _split64
from debwt_tpu.special import build_special
from debwt_tpu.types import SequenceCollection


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        np.asarray(jax.device_get(jnp.ravel(leaf)[-1:]))
    return x


def timeit(name, f, reps=3):
    out = sync(f())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = sync(f())
        ts.append(time.perf_counter() - t0)
    print(f"  {name:28s} {min(ts)*1e3:9.2f} ms")
    return out


def main(mbp=1.0):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import synth_reads

    reads = synth_reads(mbp)
    coll = SequenceCollection.from_reads(reads)
    m = 32
    N = coll.bwt_len
    n = coll.n_reads
    print(f"N = {N/1e6:.2f} Mbp, backend = {jax.default_backend()}")

    t0 = time.perf_counter()
    sp = build_special(coll, m)
    print(f"  {'special module (host)':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

    N_cap = _bucket(N)
    x2p = np.full(N_cap + K.TAIL_PAD, K.T, dtype=np.uint8)
    x2p[:N] = coll.x2
    is_sep = np.zeros(N_cap, dtype=bool)
    is_sep[coll.sep] = True
    sbm = np.zeros(N_cap, dtype=bool)
    sbm[sp.spec_branch_pos] = True
    s_hi, s_lo = _split64(sp.spec_tfill)

    t0 = time.perf_counter()
    d = jnp.asarray
    args = (d(x2p), d(is_sep), d(s_hi), d(s_lo), d(sp.spec_bwt6),
            d(sp.spec_pos_sorted.astype(np.int32)), d(sbm))
    sync(args)
    print(f"  {'h2d transfers':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

    g = timeit("stage_graph",
               lambda: engine.stage_graph(*args, jnp.int32(N), m, N_cap))
    (bwt6_partial, dist, mi_pos, base_pos, is_sp_a, sp_idx_of,
     bwt_char, L, B) = g
    t0 = time.perf_counter()
    L, B = int(L), int(B)
    print(f"  {'L/B sync':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms  "
          f"(L={L}, B={B})")
    L_cap, B_cap = _pow2(L), _pow2(B)
    f = timeit("stage_finish",
               lambda: engine.stage_finish(
                   args[0], dist, mi_pos, base_pos, is_sp_a, sp_idx_of,
                   bwt_char, bwt6_partial, jnp.int32(N),
                   m, N_cap, L_cap, B_cap, _pow2(n)))
    t0 = time.perf_counter()
    packed = np.asarray(jax.device_get(f[1]))
    print(f"  {'d2h packed':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0)
