#!/usr/bin/env python3
"""End-to-end BWT construction benchmark.

Prints ONE JSON line:
  {"metric": "bwt_construction", "value": <Mbp/s>, "unit": "Mbp/s",
   "vs_baseline": <ratio vs 8-thread reference deBWT on this host>}

The input is a deterministic synthetic genome collection with realistic
repeat structure (repeat-heavy enough that the branch tables and blue
sort do real work). The reference baseline (the checked-in deBWT ELF,
driven through the oracle harness with an exact Python k-mer counter
standing in for Jellyfish) is measured once and cached; only the
pipeline's own stage time is compared against the reference's
post-counting stages (both sides excluding k-mer-count input prep would
be unfair to neither — we INCLUDE our on-device counting and EXCLUDE
the reference's counting-script time, which favors the reference).

Env knobs:
  DEBWT_BENCH_MBP    genome size in Mbp (default 4.6, E. coli scale)
  DEBWT_BENCH_REPS   timing repetitions (default 3)
  DEBWT_BENCH_M      k-mer length m (reference -k; default 32)
  DEBWT_BENCH_DIST=1 also time the distributed path over all local
                     devices (reported on stderr + cache; the single
                     JSON line stays the single-chip metric)
  DEBWT_BENCH_SKIP_BASELINE=1   skip the reference run (ratio uses cache
                                or 0.0 if absent)
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np


def _setup_jax_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

CACHE = pathlib.Path(__file__).parent / ".bench_cache.json"


def synth_reads(mbp: float, seed: int = 0, n_genomes: int = 4,
                mutation_rate: float = 2e-3, repeat_frac: float = 0.1):
    """Synthetic genome collection: one base genome (with internal
    repeat content) plus n_genomes-1 mutated copies — the deBWT target
    workload (a collection of near-identical genomes, README.md:9).
    Mutations drive branch-node density; shared content drives deep
    common prefixes in the blue sort."""
    rng = np.random.default_rng(seed)
    per_genome = int(mbp * 1e6) // n_genomes
    # base genome with ~repeat_frac internal repeat reuse
    frag = rng.choice(4, size=max(1, per_genome // 50)).astype(np.uint8)
    parts, size = [], 0
    while size < per_genome:
        if rng.random() < repeat_frac:
            parts.append(frag)
        else:
            piece = rng.choice(4, size=int(rng.integers(5_000, 30_000))).astype(np.uint8)
            parts.append(piece)
        size += len(parts[-1])
    base = np.concatenate(parts)[:per_genome]
    reads = []
    bases = np.array(list("ACGT"))
    for g in range(n_genomes):
        gen = base.copy()
        if g:
            n_mut = int(len(gen) * mutation_rate)
            idx = rng.choice(len(gen), size=n_mut, replace=False)
            gen[idx] = (gen[idx] + rng.integers(1, 4, size=n_mut)) % 4
        reads.append("".join(bases[gen]))
    return reads


def measure_reference(reads, m=32):
    """Wall-clock of the reference binary's pipeline stages, read from
    the binary's OWN per-stage reports (src/main.c prints one line per
    stage) — this excludes only the counting script (which we replace
    with an exact Python counter), and is free of that counter's
    run-to-run variance. mySort's text-dump re-parse IS included since
    it's part of the reference's pipeline."""
    import tempfile

    from oracle.harness import run_reference

    with tempfile.TemporaryDirectory() as td:
        n_bp = sum(len(r) for r in reads)
        obj, sharp, dollar, t_stages = run_reference(
            reads, td, m=m, threads=8,
            timeout=max(600, int(n_bp / 1e6 * 60)),
            return_times=True,
        )
    return max(0.05, t_stages), obj, sharp, dollar


def main():
    mbp = float(os.environ.get("DEBWT_BENCH_MBP", "4.6"))
    reps = int(os.environ.get("DEBWT_BENCH_REPS", "3"))
    m = int(os.environ.get("DEBWT_BENCH_M", "32"))
    reads = synth_reads(mbp)
    n_bases = sum(len(r) for r in reads)
    print(f"[bench] input: {n_bases/1e6:.2f} Mbp in {len(reads)} reads, m={m}",
          file=sys.stderr)

    _setup_jax_cache()
    from debwt_tpu.pipeline import build_bwt
    from debwt_tpu.types import PipelineConfig, SequenceCollection

    coll = SequenceCollection.from_reads(reads)
    config = PipelineConfig(m=m)

    # warmup (compile)
    t0 = time.time()
    result = build_bwt(coll, config)
    result.packed()
    t_warm = time.time() - t0
    print(f"[bench] warmup (incl. compile): {t_warm:.2f}s",
          file=sys.stderr)
    times = []
    for _ in range(reps):
        t0 = time.time()
        result = build_bwt(coll, config)
        result.packed()        # include the packed-BWT device fetch
        times.append(time.time() - t0)
    t_mine = min(times)
    mbps = n_bases / 1e6 / t_mine
    print(f"[bench] pipeline best-of-{reps}: {t_mine:.3f}s = {mbps:.2f} Mbp/s",
          file=sys.stderr)
    stages = {
        k: round(v, 4) for k, v in (result.timings or {}).items()
    }
    if stages:
        print(f"[bench] stage split (s): {stages}", file=sys.stderr)

    cache = {}
    if CACHE.exists():
        cache = json.loads(CACHE.read_text())
    cache[f"tpu_mbp{mbp}_m{m}"] = {
        "seconds": t_mine, "mbps": round(mbps, 3),
        "warmup_s": round(t_warm, 2), "stages": stages,
    }
    CACHE.write_text(json.dumps(cache))

    if os.environ.get("DEBWT_BENCH_DIST") == "1":
        import jax

        from debwt_tpu.parallel import dist_build_bwt, make_mesh

        mesh = make_mesh()
        n_dev = int(mesh.devices.size)
        t0 = time.time()
        dres = dist_build_bwt(coll, config, mesh)
        print(f"[bench] dist warmup ({n_dev} dev, incl. compile): "
              f"{time.time()-t0:.2f}s", file=sys.stderr)
        dtimes = []
        for _ in range(reps):
            t0 = time.time()
            dres = dist_build_bwt(coll, config, mesh)
            dtimes.append(time.time() - t0)
        assert (dres.bwt6 == result.bwt6).all()
        d_mbps = n_bases / 1e6 / min(dtimes)
        print(f"[bench] dist best-of-{reps}: {min(dtimes):.3f}s = "
              f"{d_mbps:.2f} Mbp/s over {n_dev} device(s)", file=sys.stderr)
        cache[f"dist_mbp{mbp}_m{m}_n{n_dev}"] = {
            "seconds": min(dtimes), "mbps": d_mbps,
        }
        CACHE.write_text(json.dumps(cache))

    # baseline
    key = f"ref_mbp{mbp}" if m == 32 else f"ref_mbp{mbp}_m{m}"
    if os.environ.get("DEBWT_BENCH_SKIP_BASELINE") != "1" and key not in cache:
        try:
            import hashlib

            t_ref, obj, sharp, dollar = measure_reference(reads, m=m)
            cache[key] = {
                "seconds": t_ref,
                "mbps": n_bases / 1e6 / t_ref,
                "obj_sha": hashlib.sha256(obj).hexdigest(),
                "sharp_sha": hashlib.sha256(sharp.tobytes()).hexdigest(),
                "dollar": int(dollar),
            }
            CACHE.write_text(json.dumps(cache))
            print(f"[bench] reference: {t_ref:.2f}s = "
                  f"{cache[key]['mbps']:.2f} Mbp/s", file=sys.stderr)
        except Exception as e:  # reference unavailable — report raw perf
            print(f"[bench] baseline skipped: {e}", file=sys.stderr)
    ref = cache.get(key, {})
    if ref.get("obj_sha"):
        import hashlib

        ok = (
            hashlib.sha256(result.packed()).hexdigest() == ref["obj_sha"]
            and hashlib.sha256(
                result.sharp_pos.astype(np.int64).tobytes()
            ).hexdigest() == ref["sharp_sha"]
            and result.dollar_pos == ref["dollar"]
        )
        print(f"[bench] byte-identical to reference: {ok}", file=sys.stderr)
        assert ok, "output differs from the reference binary!"
    vs = mbps / ref["mbps"] if ref.get("mbps") else 0.0
    print(json.dumps({
        "metric": "bwt_construction",
        "value": round(mbps, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(vs, 3),
        "input_mbp": round(n_bases / 1e6, 2),
        "warmup_s": round(t_warm, 2),
        "stages_s": stages,
    }))


if __name__ == "__main__":
    main()
