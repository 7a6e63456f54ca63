"""Tier routing: one entry point that picks the right execution path.

The reference covers its whole operating envelope (up to the 30 Gbp
LF-walk design cap, src/LFsearch.c:56) with one code path; here the
envelope is covered by three, each idiomatic for its scale:

  single   fused one-sort engine (pipeline.build_bwt), R < 2^29 rows
  grouped  device-resident grouped engine (grouped.build_bwt_grouped):
           bounded device memory via key-range groups re-derived from
           HBM-resident packed text; N < ~3.7e9 (uint32 positions)
  dist     multi-device shard_map pipeline (parallel.dist_build_bwt)
  ooc      out-of-core chunked pipeline with host-DRAM spill
           (oocore.build_bwt_ooc) when the collection exceeds even the
           grouped tier's position bound

`build` routes on collection size and device count so callers (CLI,
bench) never hit a tier's NotImplementedError by accident.
"""

from __future__ import annotations

import os
import sys

from debwt_tpu.pipeline import BwtResult, _bucket, _pow2, build_bwt
from debwt_tpu.types import PipelineConfig, SequenceCollection

# Single-chip fused-engine row bound (engine.stage_graph packs segment
# facts beside row indices in int32 scans).
_SINGLE_ROWS = 1 << 29


def _single_rows_hbm() -> int:
    # Practical HBM bound for the fused engine on a 16 GB chip:
    # measured r04, stage_finish compiles+runs at R = 268M (250 Mbp,
    # ~9.5 GB of HLO temp) and is rejected at R = 403M (400 Mbp,
    # 13.5 GB — XLA pads the sort temps ~4.5x with its tiled layout).
    # Inputs between this cap and _SINGLE_ROWS route to the grouped /
    # dist / ooc tiers instead of OOMing. Env override for bigger-HBM
    # chips: DEBWT_SINGLE_MAX_ROWS (read per call, so setting it after
    # import works).
    return int(os.environ.get("DEBWT_SINGLE_MAX_ROWS", 300 * 10**6))


def _fits_single(coll: SequenceCollection, m: int) -> bool:
    rows = _bucket(coll.bwt_len) + _pow2(coll.n_reads * (m - 1))
    return rows < min(_SINGLE_ROWS, _single_rows_hbm())


def build(
    coll: SequenceCollection,
    config: PipelineConfig | None = None,
    n_devices: int | None = None,
    verbose: bool = False,
) -> BwtResult:
    """Construct the BWT, auto-routing to the right tier.

    n_devices: force the distributed path over N devices (the CLI
    --dist flag); None picks single-chip when it fits, else all local
    devices, else the out-of-core tier.
    """
    config = config or PipelineConfig()

    def _say(msg):
        if verbose:
            print(f"[debwt-tpu] route: {msg}", file=sys.stderr)

    if n_devices:
        from debwt_tpu.parallel import dist_build_bwt, make_mesh

        _say(f"distributed over {n_devices} devices (requested)")
        return dist_build_bwt(coll, config, make_mesh(n_devices))

    if _fits_single(coll, config.m):
        _say("single-chip fused engine")
        return build_bwt(coll, config)

    import jax

    n_dev = len(jax.devices())
    # per-shard row bound for the dist tier (per-shard arrays are int32)
    per_shard = -(-coll.bwt_len // max(1, n_dev))
    # the dist tier's bound is per-shard (split indices; int32 local
    # positions), so only the per-shard row count gates the route
    if n_dev > 1 and per_shard < _SINGLE_ROWS:
        _say(f"distributed over all {n_dev} local devices "
             f"(N={coll.bwt_len} exceeds the single-chip row bound)")
        from debwt_tpu.parallel import dist_build_bwt, make_mesh

        return dist_build_bwt(coll, config, make_mesh(n_dev))

    from debwt_tpu.grouped import MAX_N, GroupOverflow, build_bwt_grouped

    if coll.bwt_len < MAX_N and os.environ.get("DEBWT_FORCE_OOC") != "1":
        _say(f"grouped device-resident tier (N={coll.bwt_len}, "
             f"single chip)")
        try:
            return build_bwt_grouped(coll, config)
        except GroupOverflow as e:
            # a single node key outgrew the group cap (pathological
            # repeat mass); the ooc tier's giant-bucket path handles it
            _say(f"grouped tier overflow ({e}); out-of-core fallback")

    _say(f"out-of-core chunked tier (N={coll.bwt_len}, {n_dev} device(s))")
    from debwt_tpu.oocore import build_bwt_ooc

    mesh = None
    if n_dev > 1:
        # ooc x dist composition: SP ranking shards over the mesh when
        # the SP string exceeds the single-device cap (30 Gbp shape)
        from debwt_tpu.parallel import make_mesh

        mesh = make_mesh(n_dev)
    return build_bwt_ooc(coll, config, mesh=mesh)
