#!/usr/bin/env python3
"""Grouped-tier benchmark: single-chip throughput at 300 Mbp-3.7 Gbp.

Usage: python tools/bench_grouped.py [mbp] [--cap ROWS] [--chunk C]
                                     [--verify STEPS] [--reps R]

Builds the same synthetic near-identical-genome collection as
tools/bench_ooc.py and runs it through the device-resident grouped
tier (debwt_tpu.grouped). Reports one JSON line with wall, Mbp/s,
host RSS, the stage split, conservation, and (when --verify is given)
an LF backward-walk check of the last STEPS characters via the native
walker (csrc/lf_walk.cpp — the reference's dead verification path,
src/LFsearch.c:49-166, resurrected).

The north-star row (VERDICT r04): >= 1 Gbp on one chip at >= 5.81
Mbp/s (the reference's 250 Mbp stage-time rate), conservation + LF
verified.
"""

import json
import os
import pathlib
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from bench_ooc import synth_concat  # noqa: E402


def main():
    args = sys.argv[1:]
    mbp = float(args[0]) if args and not args[0].startswith("-") else 1000.0
    cap = None
    chunk = None
    verify_steps = 0
    reps = 1
    it = iter(args)
    for a in it:
        if a == "--cap":
            cap = int(next(it))
        elif a == "--chunk":
            chunk = int(next(it))
        elif a == "--verify":
            verify_steps = int(next(it))
        elif a == "--reps":
            reps = int(next(it))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from debwt_tpu.grouped import GroupedConfig, build_bwt_grouped
    from debwt_tpu.types import PipelineConfig, SequenceCollection

    t0 = time.time()
    codes, lengths = synth_concat(mbp)
    coll = SequenceCollection.from_concat(codes, lengths)
    del codes
    n_bases = coll.bwt_len - coll.n_reads
    print(f"[grouped-bench] input: {n_bases/1e6:.1f} Mbp "
          f"({time.time()-t0:.1f}s synth)", file=sys.stderr)

    kw = {}
    if cap:
        kw["cap"] = cap
    if chunk:
        kw["chunk"] = chunk
    gcfg = GroupedConfig(**kw)
    best = None
    stats: dict = {}
    for rep in range(reps):
        stats = {}
        t0 = time.time()
        res = build_bwt_grouped(
            coll, PipelineConfig(m=32), gcfg, stats=stats
        )
        wall = time.time() - t0
        print(f"[grouped-bench] rep {rep}: {wall:.1f}s "
              f"({n_bases/1e6/wall:.2f} Mbp/s)", file=sys.stderr)
        if best is None or wall < best[0]:
            best = (wall, res, stats)
    wall, res, stats = best

    got = np.bincount(res.bwt6, minlength=6)
    want = np.bincount(coll.x6, minlength=6)
    ok = bool((got == want).all())
    lf_ok = None
    if verify_steps:
        from debwt_tpu.verify import lf_verify

        t0 = time.time()
        lf_ok = bool(lf_verify(res, coll, max_steps=verify_steps or None))
        print(f"[grouped-bench] LF verify ({verify_steps} steps): "
              f"{lf_ok} ({time.time()-t0:.1f}s)", file=sys.stderr)

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "metric": "bwt_grouped",
        "mbp": round(n_bases / 1e6, 1),
        "seconds": round(wall, 1),
        "mbps": round(n_bases / 1e6 / wall, 3),
        "host_rss_gb": round(rss_gb, 2),
        "n_groups": stats.get("n_groups"),
        "cap": stats.get("cap"),
        "sp_len": stats.get("sp_len"),
        "n_blue": stats.get("n_blue"),
        "stages_s": {k: round(v, 1) for k, v in
                     (stats.get("stage_s") or {}).items()},
        "conservation_ok": ok,
        "lf_verify": lf_ok,
    }
    print(json.dumps(out))
    cache = pathlib.Path(__file__).parent.parent / ".bench_cache.json"
    data = json.loads(cache.read_text()) if cache.exists() else {}
    data[f"grouped_mbp{mbp}"] = out
    cache.write_text(json.dumps(data))
    if not ok or lf_ok is False:
        sys.exit(1)


if __name__ == "__main__":
    main()
