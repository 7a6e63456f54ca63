#!/usr/bin/env python3
"""Dist-tier wall-clock scaling table over the virtual CPU mesh.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_table.py [mbp] [n_list]

Runs dist_build_bwt on ONE input at each mesh size in n_list (default
1,2,4,8), verifying byte-equality against the fused single-path
result, and prints a Markdown table (wall seconds per mesh size,
best of 2 after a compile warmup). CPU-mesh times measure the
orchestration + collective schedule, not TPU silicon — the point is a
recorded perf artifact for the dist tier and its scaling shape
(BASELINE.md gets the table).
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
# force the virtual CPU mesh: the axon sitecustomize registers the TPU
# backend ignoring JAX_PLATFORMS (see tests/conftest.py), so set the
# device-count flag and flip the platform config before any device use
if "--xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax as _jax

_jax.config.update("jax_platforms", "cpu")

import numpy as np


def synth(mbp: float, seed: int = 0):
    rng = np.random.default_rng(seed)
    per = int(mbp * 1e6) // 4
    base = rng.choice(4, size=per).astype(np.uint8)
    reads = []
    for g in range(4):
        gen = base.copy()
        if g:
            idx = rng.choice(per, size=max(1, per // 500), replace=False)
            gen[idx] = (gen[idx] + 1) % 4
        reads.append(gen)
    return reads


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    n_list = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 2, 4, 8]
    )
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from debwt_tpu.parallel import dist_build_bwt, make_mesh
    from debwt_tpu.pipeline import build_bwt
    from debwt_tpu.types import PipelineConfig, SequenceCollection

    reads = synth(mbp)
    coll = SequenceCollection.from_concat(
        np.concatenate(reads), np.array([len(r) for r in reads])
    )
    config = PipelineConfig(m=32)
    print(f"input: {coll.bwt_len/1e6:.2f} M chars over mesh sizes {n_list}",
          file=sys.stderr)
    ref = build_bwt(coll, config)
    rows = []
    for n in n_list:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        mesh = make_mesh(n)
        t0 = time.time()
        res = dist_build_bwt(coll, config, mesh)
        warm = time.time() - t0
        assert (res.bwt6 == ref.bwt6).all(), f"n={n}: output differs!"
        best = min(
            _timed(dist_build_bwt, coll, config, mesh) for _ in range(2)
        )
        rows.append((n, warm, best))
        print(f"n={n}: warmup {warm:.2f}s, best {best:.2f}s", file=sys.stderr)

    # base the speedup on the n==1 row when it ran; otherwise label
    # honestly against the smallest mesh that did
    base_row = next((r for r in rows if r[0] == 1), rows[0] if rows else None)
    base_lbl = "vs n=1" if (base_row and base_row[0] == 1) else (
        f"vs n={base_row[0]}" if base_row else "vs n=1"
    )
    print(f"\n| mesh n | warmup (s) | best wall (s) | Mbp/s | speedup {base_lbl} |")
    print("|---|---|---|---|---|")
    base_t = base_row[2] if base_row else 1.0
    for n, warm, best in rows:
        print(f"| {n} | {warm:.2f} | {best:.2f} | "
              f"{coll.bwt_len/1e6/best:.2f} | {base_t/best:.2f}x |")


def _timed(fn, *a):
    t0 = time.time()
    r = fn(*a)
    r.bwt6  # force the host stitch
    return time.time() - t0


if __name__ == "__main__":
    main()
