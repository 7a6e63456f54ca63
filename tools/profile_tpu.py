#!/usr/bin/env python3
"""Per-stage TPU timing for the fused single-chip engine.

Usage: python3 tools/profile_tpu.py [mbp]
Note: on the axon platform block_until_ready does not reliably sync;
every timing below forces a scalar host fetch. Per-dispatch latency on
the tunneled backend is noisy (~25-370 ms observed for the SAME
program between runs) — trust the end-to-end pipeline numbers, and
treat single-op timings as order-of-magnitude only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from debwt_tpu import constants as K
from debwt_tpu import engine, ops
from debwt_tpu.pipeline import _bucket, _pow2, _split64
from debwt_tpu.special import build_special
from debwt_tpu.types import SequenceCollection


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
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
    print(f"  {'special module (host)':28s} "
          f"{(time.perf_counter()-t0)*1e3:9.2f} ms")

    N_cap = _bucket(N)
    x2p = np.full(N_cap + K.TAIL_PAD, K.T, dtype=np.uint8)
    x2p[:N] = coll.x2
    s_hi, s_lo = _split64(sp.spec_tfill)
    ns_cap = _pow2(s_hi.shape[0])

    def pad(a, cap, fill):
        out = np.full(cap, fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return jnp.asarray(out)

    t0 = time.perf_counter()
    spec_branch_d = pad(
        sp.spec_branch_pos.astype(np.int32),
        _pow2(max(1, sp.spec_branch_pos.shape[0])), N_cap,
    )
    args = (
        jnp.asarray(ops.pack_2bit_words_host(x2p)),
        pad(coll.sep.astype(np.int32), _pow2(n), N_cap),
        pad(s_hi, ns_cap, np.uint32(0xFFFFFFFF)),
        pad(s_lo, ns_cap, np.uint32(0xFFFFFFFF)),
        pad(sp.spec_bwt6, ns_cap, 0),
        spec_branch_d,
        jnp.int32(N),
    )
    sync(args)
    print(f"  {'host pack + h2d':28s} "
          f"{(time.perf_counter()-t0)*1e3:9.2f} ms")

    g = timeit("stage_graph",
               lambda: engine.stage_graph(*args, m, N_cap))
    (bwt6_partial, ev_key, mi_row, seg_start, r_pos,
     bwt_char, L, B, x2p_d) = g
    t0 = time.perf_counter()
    L, B = int(L), int(B)
    print(f"  {'L/B sync':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms  "
          f"(L={L}, B={B})")
    L_cap, B_cap = _bucket(L), _bucket(B)
    f = timeit("stage_finish",
               lambda: engine.stage_finish(
                   x2p_d, ev_key, mi_row, seg_start, r_pos,
                   bwt_char, bwt6_partial, spec_branch_d, jnp.int32(N),
                   m, N_cap, L_cap, B_cap, _pow2(n)))
    t0 = time.perf_counter()
    packed = np.asarray(jax.device_get(f[1]))
    print(f"  {'d2h packed':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms  "
          f"({packed.nbytes/1e6:.1f} MB)")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0)
