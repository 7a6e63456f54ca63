#!/usr/bin/env python3
"""Per-stage TPU timing for the single-chip pipeline."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from debwt_tpu import assemble, bluesort, classify, count, spcode
from debwt_tpu import constants as K
from debwt_tpu.pipeline import _pow2, _split64
from debwt_tpu.special import build_special
from debwt_tpu.types import PipelineConfig, SequenceCollection


def bench_stage(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {name:28s} {min(ts)*1e3:9.2f} ms")
    return out


def main(mbp=1.0):
    rng = np.random.default_rng(0)
    total = int(mbp * 1e6)
    frags = ["".join(rng.choice(list("ACGT"), size=5000)) for _ in range(32)]
    reads = []
    n_reads = 4
    for _ in range(n_reads):
        parts, size = [], 0
        while size < total // n_reads:
            f = (frags[int(rng.integers(32))] if rng.random() < 0.25 else
                 "".join(rng.choice(list("ACGT"), size=8000)))
            parts.append(f)
            size += len(f)
        reads.append("".join(parts))
    coll = SequenceCollection.from_reads(reads)
    m, k = 32, 31
    N, n = coll.bwt_len, coll.n_reads
    print(f"N = {N/1e6:.2f} Mbp, backend = {jax.default_backend()}")

    t0 = time.perf_counter()
    sp = build_special(coll, m)
    print(f"  {'special module (host)':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

    x2p = np.concatenate([coll.x2, np.full(K.TAIL_PAD, K.T, np.uint8)])
    t0 = time.perf_counter()
    d_x2p = jnp.asarray(x2p)
    d_sep = jnp.asarray(coll.sep.astype(np.int32))
    jax.block_until_ready(d_x2p)
    print(f"  {'h2d transfer':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

    dist = bench_stage("distance_to_separator",
                       count.distance_to_separator, d_sep,
                       jnp.zeros(N, jnp.int32))
    n_edges = N - n * m
    e = bench_stage("extract_and_sort_edges",
                    lambda a, b: count.extract_and_sort_edges(a, b, m, n_edges),
                    d_x2p, dist)
    e_hi, e_lo, _ = e
    th, tl = map(jnp.asarray, _split64(sp.tail_keys))
    hh, hl = map(jnp.asarray, _split64(sp.head_keys))
    cap_nodes = n_edges + n + 1
    nt = bench_stage("build_node_table",
                     lambda *a: classify.build_node_table(*a, k, cap_nodes),
                     e_hi, e_lo, th, tl, hh, hl)
    node_hi, node_lo, cnt, multi_in, multi_out, pred, num_nodes = nt
    s_hi, s_lo = map(jnp.asarray, _split64(sp.spec_tfill))
    bu = bench_stage("build_units", classify.build_units,
                     node_hi, node_lo, cnt, multi_in, s_hi, s_lo)
    node_start, spec_bwtpos = bu
    sbm = np.zeros(N, dtype=bool)
    sbm[sp.spec_branch_pos] = True
    cp = bench_stage("classify_positions",
                     lambda *a: spcode.classify_positions(*a, k),
                     d_x2p, dist, node_hi, node_lo, multi_in, multi_out,
                     jnp.asarray(sbm))
    is_sp, is_blue, node_id = cp
    t0 = time.perf_counter()
    L = int(jnp.sum(is_sp)); B = int(jnp.sum(is_blue))
    print(f"  {'L/B host sync':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms   (L={L}, B={B})")
    L_cap, B_cap = _pow2(L), _pow2(B)
    sb = bench_stage("build_sp_and_blue",
                     lambda *a: spcode.build_sp_and_blue(*a, k, L_cap, B_cap, n),
                     d_x2p, dist, is_sp, is_blue, node_id, d_sep)
    sp_pos, sp6, blue_node, blue_spidx, blue_char6 = sb
    sp6m = jnp.where(jnp.arange(L_cap) < L, sp6, 0)
    sp6_ext = jnp.concatenate([sp6m, jnp.zeros(L_cap, jnp.uint8)])
    rk = bench_stage("sp_suffix_ranks", bluesort.sp_suffix_ranks, sp6_ext)
    sp_rank = rk[:L_cap]
    blue_valid = jnp.arange(B_cap) < B
    bn = jnp.where(blue_valid, blue_node, cap_nodes)
    ob = bench_stage("order_blue", bluesort.order_blue,
                     bn, jnp.minimum(blue_spidx, L_cap - 1), blue_char6,
                     sp_rank, jnp.concatenate([node_start, jnp.full(1, N, jnp.int32)]))
    blue_pos_abs, blue_sorted_char = ob
    ab = bench_stage("assemble_bwt6",
                     lambda *a: assemble.assemble_bwt6(*a, N),
                     node_start, cnt, multi_in, pred,
                     spec_bwtpos, jnp.asarray(sp.spec_bwt6),
                     blue_pos_abs, blue_sorted_char)
    t0 = time.perf_counter()
    h = np.asarray(jax.device_get(ab))
    print(f"  {'d2h transfer':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0)
