"""Command-line interface.

Mirrors the reference CLI (src/main.c:175-186) with TPU-native flags:

  python -m debwt_tpu.cli -o out.bwt [-k 32] [--dist N] [--verify]
                          [--n-policy reject|random|to-g] input.fa[.gz]

`-t`/`-j` are accepted for drop-in compatibility and ignored (threads
are the device mesh; no Jellyfish is needed — counting is on-device).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="debwt-tpu",
        description="TPU-native BWT construction (deBWT-compatible output)",
    )
    p.add_argument("source", help="sequence collection (fasta/fastq, .gz ok)")
    p.add_argument("-o", dest="obj", required=True, help="output bwt file")
    p.add_argument("-k", dest="m", type=int, default=32,
                   help="k-mer length (12..32, default 32)")
    p.add_argument("-t", dest="threads", type=int, default=None,
                   help="(compat, ignored — use --dist)")
    p.add_argument("-j", dest="jroot", default=None,
                   help="(compat, ignored — no Jellyfish needed)")
    p.add_argument("--dist", type=int, default=0, metavar="N",
                   help="run distributed over N devices")
    p.add_argument("--n-policy", default="reject",
                   choices=["reject", "random", "to-g"],
                   help="handling of N/IUPAC characters")
    p.add_argument("--seed", type=int, default=11,
                   help="seed for --n-policy random")
    p.add_argument("--verify", action="store_true",
                   help="LF-walk invertibility check after construction")
    p.add_argument("--verify-steps", type=int, default=None, metavar="S",
                   help="bound the LF walk to the last S chars (default: full)")
    p.add_argument("--check", action="store_true",
                   help="enable internal invariant checks")
    p.add_argument("--timings", action="store_true",
                   help="print per-stage wall time + Mbp/s (the "
                        "reference prints these on every run, "
                        "src/main.c:86-170)")
    args = p.parse_args(argv)

    # multi-host: join the jax.distributed cluster BEFORE any other
    # debwt_tpu import (package import touches the XLA backend, and
    # jax.distributed.initialize must run first). No-op unless
    # DEBWT_COORDINATOR / DEBWT_NUM_PROCESSES are set by the launcher.
    import os as _os

    multi = False
    rank0 = True
    if _os.environ.get("DEBWT_COORDINATOR") or _os.environ.get(
        "DEBWT_NUM_PROCESSES"
    ):
        import jax

        v = _os.environ.get("DEBWT_NUM_PROCESSES")
        w = _os.environ.get("DEBWT_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=_os.environ.get("DEBWT_COORDINATOR"),
            num_processes=int(v) if v else None,
            process_id=int(w) if w else None,
        )
        multi = jax.process_count() > 1
        rank0 = jax.process_index() == 0

    def say(msg):
        if rank0:
            print(msg, file=sys.stderr)

    from debwt_tpu.io import read_collection, write_bwt
    from debwt_tpu.types import PipelineConfig

    # pre-flight: output writability (src/main.c:55-58); rank 0 only —
    # concurrent create/remove of one path races across processes
    if rank0:
        try:
            with open(args.obj, "wb"):
                pass
            import os

            os.remove(args.obj)
        except OSError as e:
            print(f"cannot create {args.obj}: {e}", file=sys.stderr)
            return 1

    t0 = time.time()
    coll = read_collection(args.source, args.n_policy, args.seed)
    say(f"[debwt-tpu] {coll.n_reads} reads, "
        f"{(coll.bwt_len - coll.n_reads)/1e6:.2f} Mbp "
        f"({time.time()-t0:.2f}s ingest)")
    config = PipelineConfig(m=args.m, check=args.check)

    t1 = time.time()
    from debwt_tpu.api import build

    result = build(coll, config, n_devices=args.dist or None,
                   verbose=rank0)
    dt = time.time() - t1
    say(f"[debwt-tpu] BWT of {coll.bwt_len} chars in {dt:.2f}s "
        f"({coll.bwt_len/1e6/dt:.2f} Mbp/s)")
    if args.timings and getattr(result, "timings", None):
        mbp = coll.bwt_len / 1e6
        for label, secs in result.timings.items():
            say(f"[debwt-tpu]   {label:28s} {secs:8.3f}s"
                f"  ({mbp / max(secs, 1e-9):8.2f} Mbp/s)")

    if rank0:
        write_bwt(result, args.obj)
    say(f"[debwt-tpu] wrote {args.obj} (+ .#, .$)")

    if args.verify:
        from debwt_tpu.verify import lf_verify

        ok = lf_verify(result, coll, max_steps=args.verify_steps)
        print(f"[debwt-tpu] LF invertibility: {'OK' if ok else 'FAILED'}",
              file=sys.stderr)
        if not ok:
            return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
