#!/usr/bin/env python3
"""Out-of-core tier benchmark: throughput + resource envelope at >= 1 Gbp.

Usage: python tools/bench_ooc.py [mbp] [--spill DIR] [--buckets B] [--chunk C]

Builds a synthetic near-identical-genomes collection (the deBWT target
workload), runs it through debwt_tpu.oocore.build_bwt_ooc with DISK
spill force-enabled, and reports one JSON line:

  {"metric": "bwt_ooc", "mbp": ..., "seconds": ..., "mbps": ...,
   "host_rss_gb": ..., "spill_peak_gb": ..., "stages_s": {...},
   "conservation_ok": true}

The reference's envelope at 30 Gbp is ~120 GB RAM / ~200 GB temp disk
(/root/reference/README.md:18); this records the TPU tier's envelope
beside it (BASELINE.md). Conservation (per-char counts) is checked in
lieu of byte-parity: the reference binary cannot run at this scale on
this host (its Jellyfish stand-in is an exact in-RAM Python counter).
"""

import json
import os
import pathlib
import resource
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)

import numpy as np


def synth_concat(mbp: float, seed: int = 0, n_genomes: int = 4,
                 mutation_rate: float = 2e-3):
    """Vectorized synthetic collection (no Python strings — at 1 Gbp a
    join of str reads would dominate setup)."""
    rng = np.random.default_rng(seed)
    per = int(mbp * 1e6) // n_genomes
    base = rng.integers(0, 4, size=per, dtype=np.int64).astype(np.uint8)
    reads, lengths = [], []
    for g in range(n_genomes):
        gen = base.copy()
        if g:
            n_mut = int(per * mutation_rate)
            idx = rng.choice(per, size=n_mut, replace=False)
            gen[idx] = (gen[idx] + rng.integers(1, 4, size=n_mut)) % 4
        reads.append(gen)
        lengths.append(per)
    return np.concatenate(reads), np.array(lengths)


class SpillWatcher(threading.Thread):
    """Samples the spill dir's total size to capture PEAK usage (files
    are deleted as consumed, so the end state under-reports)."""

    def __init__(self, root: pathlib.Path, interval: float = 2.0):
        super().__init__(daemon=True)
        self.root, self.interval = root, interval
        self.peak = 0
        # NB: must not be named _stop — threading.Thread uses that name
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            total = 0
            try:
                for p in self.root.rglob("*"):
                    try:
                        total += p.stat().st_size
                    except OSError:
                        pass
            except OSError:
                pass
            self.peak = max(self.peak, total)
            self._halt.wait(self.interval)

    def stop(self):
        self._halt.set()


def main():
    args = sys.argv[1:]
    mbp = float(args[0]) if args and not args[0].startswith("-") else 1000.0
    spill = None
    buckets = 256
    chunk = 1 << 26
    it = iter(args)
    for a in it:
        if a == "--spill":
            spill = next(it)
        elif a == "--buckets":
            buckets = int(next(it))
        elif a == "--chunk":
            chunk = int(next(it))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from debwt_tpu.oocore import OocConfig, build_bwt_ooc
    from debwt_tpu.types import PipelineConfig, SequenceCollection

    t0 = time.time()
    codes, lengths = synth_concat(mbp)
    coll = SequenceCollection.from_concat(codes, lengths)
    del codes
    n_bases = coll.bwt_len - coll.n_reads
    print(f"[ooc-bench] input: {n_bases/1e6:.1f} Mbp "
          f"({time.time()-t0:.1f}s synth)", file=sys.stderr)

    own_tmp = spill is None
    spill_dir = spill or tempfile.mkdtemp(prefix="debwt_ooc_")
    watcher = SpillWatcher(pathlib.Path(spill_dir))
    watcher.start()
    stats: dict = {}
    timings: dict = {}
    t0 = time.time()
    try:
        res = build_bwt_ooc(
            coll, PipelineConfig(m=32),
            OocConfig(chunk=chunk, n_buckets=buckets, spill_dir=spill_dir),
            stats=stats,
        )
        # force everything observable
        bwt6 = res.bwt6
        wall = time.time() - t0
    finally:
        watcher.stop()
        watcher.join(timeout=5)
        if own_tmp:
            import shutil

            shutil.rmtree(spill_dir, ignore_errors=True)

    got = np.bincount(bwt6, minlength=6)
    want = np.bincount(coll.x6, minlength=6)
    ok = bool((got == want).all())
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "metric": "bwt_ooc",
        "mbp": round(n_bases / 1e6, 1),
        "seconds": round(wall, 1),
        "mbps": round(n_bases / 1e6 / wall, 3),
        "host_rss_gb": round(rss_gb, 2),
        "spill_peak_gb": round(watcher.peak / 1e9, 2),
        "stages_s": {k: round(v, 1) for k, v in
                     (stats.get("stage_s") or {}).items()},
        "n_chunks": stats.get("n_chunks"),
        "sp_len": stats.get("sp_len"),
        "conservation_ok": ok,
    }
    print(json.dumps(out))
    cache = pathlib.Path(__file__).parent.parent / ".bench_cache.json"
    data = json.loads(cache.read_text()) if cache.exists() else {}
    data[f"ooc_mbp{mbp}"] = out
    cache.write_text(json.dumps(data))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
