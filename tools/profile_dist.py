#!/usr/bin/env python3
"""Per-stage wall timing of the distributed pipeline.

Usage: python tools/profile_dist.py [mbp] [n_devices]

Monkeypatch-free: relies on DEBWT_TRACE-style host timestamps around
the host syncs inside dist_build_bwt (each _fetch is a sync point), by
wrapping dist._fetch and the jitted stage calls with timers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)

import numpy as np


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())

    import debwt_tpu.parallel.dist as dist
    import debwt_tpu.parallel.sprank as sprank
    from debwt_tpu.parallel import dist_build_bwt, make_mesh
    from debwt_tpu.types import PipelineConfig, SequenceCollection

    rng = np.random.default_rng(0)
    n = int(mbp * 1e6)
    base = rng.choice(4, size=n // 4).astype(np.uint8)
    reads = []
    for g in range(4):
        gen = base.copy()
        if g:
            idx = rng.choice(len(gen), size=len(gen) // 500, replace=False)
            gen[idx] = (gen[idx] + 1) % 4
        reads.append(gen)
    coll = SequenceCollection.from_concat(
        np.concatenate(reads), np.array([len(r) for r in reads])
    )
    print(f"input: {coll.bwt_len/1e6:.2f} M chars, mesh n={n_dev}",
          file=sys.stderr)

    marks = []
    real_fetch = dist._fetch

    def timed_fetch(x):
        t0 = time.time()
        out = real_fetch(x)
        marks.append(("fetch", time.time() - t0))
        return out

    dist._fetch = timed_fetch
    n_rounds = [0]
    real_round = sprank._make_round

    def counting_round(*a, **k):
        fn = real_round(*a, **k)

        def wrapped(rank, L):
            t0 = time.time()
            out = fn(rank, L)
            jax.block_until_ready(out[0])
            marks.append(("sprank_round", time.time() - t0))
            n_rounds[0] += 1
            return out

        return wrapped

    sprank._make_round = counting_round

    mesh = make_mesh(n_dev)
    for it in range(3):
        marks.clear()
        n_rounds[0] = 0
        t0 = time.time()
        res = dist_build_bwt(coll, PipelineConfig(), mesh)
        dt = time.time() - t0
        tag = "warmup" if it == 0 else f"run{it}"
        fetches = [d for k, d in marks if k == "fetch"]
        rounds = [d for k, d in marks if k == "sprank_round"]
        print(
            f"{tag}: total {dt:7.2f}s | {len(fetches)} fetches "
            f"{sum(fetches):6.2f}s | {len(rounds)} sprank rounds "
            f"{sum(rounds):6.2f}s | other {dt-sum(fetches)-sum(rounds):6.2f}s",
            file=sys.stderr,
        )
        if it == 2:
            # fetch i waits for everything dispatched since fetch i-1,
            # so the sequence localizes stage cost
            print("  fetch sequence: "
                  + " ".join(f"{d:.2f}" for k, d in marks if k == "fetch"),
                  file=sys.stderr)
    print(f"Mbp/s (last run): {coll.bwt_len/1e6/dt:.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
