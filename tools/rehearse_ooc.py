#!/usr/bin/env python3
"""Out-of-core dress rehearsal: a REAL mid-run kill + resume at scale.

Usage: python tools/rehearse_ooc.py [mbp] [--spill DIR] [--buckets B]
                                    [--kill-frac F]

Launches an out-of-core build (disk spill + checkpoint enabled) as a
subprocess, watches the checkpoint manifest, SIGKILLs the process once
pass B is ~F of the way through its buckets, then relaunches and lets
the resume path finish the construction. Reports one JSON line with
both phases' wall, the bucket the kill landed on, the resume attach
point, host RSS, spill peak, and the conservation check.

This is the r04 checkpoint/resume test (tests/test_oocore.py) promoted
to a benchmark-scale artifact — the reference has no resume at all
(its temp files are deleted as consumed and its stage state lives in
process globals, SURVEY §5)."""

import json
import os
import pathlib
import signal
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, resource, sys, time
sys.path.insert(0, os.path.join({here!r}, "..", "src"))
sys.path.insert(0, {here!r})
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join({here!r}, "..", ".jax_cache"))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
from bench_ooc import synth_concat
from debwt_tpu.oocore import OocConfig, build_bwt_ooc
from debwt_tpu.types import PipelineConfig, SequenceCollection

codes, lengths = synth_concat({mbp})
coll = SequenceCollection.from_concat(codes, lengths)
del codes
stats = {{}}
t0 = time.time()
res = build_bwt_ooc(
    coll, PipelineConfig(m=32),
    OocConfig(chunk={chunk}, n_buckets={buckets}, spill_dir={spill!r},
              checkpoint=True),
    stats=stats,
)
wall = time.time() - t0
got = np.bincount(res.bwt6, minlength=6)
want = np.bincount(coll.x6, minlength=6)
out = dict(
    wall=round(wall, 1),
    rss_gb=round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    conservation_ok=bool((got == want).all()),
    stages_s={{k: round(v, 1) for k, v in (stats.get("stage_s") or {{}}).items()}},
)
print("CHILD_RESULT " + json.dumps(out), flush=True)
"""


def main():
    args = sys.argv[1:]
    mbp = float(args[0]) if args and not args[0].startswith("-") else 1000.0
    spill = None
    buckets = 256
    chunk = 1 << 26
    kill_frac = 0.5
    it = iter(args)
    for a in it:
        if a == "--spill":
            spill = next(it)
        elif a == "--buckets":
            buckets = int(next(it))
        elif a == "--chunk":
            chunk = int(next(it))
        elif a == "--kill-frac":
            kill_frac = float(next(it))

    own_tmp = spill is None
    spill_dir = spill or tempfile.mkdtemp(prefix="debwt_rehearse_")
    os.makedirs(spill_dir, exist_ok=True)
    manifest = pathlib.Path(spill_dir) / "manifest.json"
    script = CHILD.format(here=HERE, mbp=mbp, chunk=chunk,
                          buckets=buckets, spill=spill_dir)

    def _spawn():
        return subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    def _spill_size():
        total = 0
        for p in pathlib.Path(spill_dir).rglob("*"):
            try:
                total += p.stat().st_size
            except OSError:
                pass
        return total

    # phase 1: run until pass B crosses kill_frac, then SIGKILL
    t0 = time.time()
    child = _spawn()
    killed_at = None
    spill_peak = 0
    while child.poll() is None:
        time.sleep(2.0)
        spill_peak = max(spill_peak, _spill_size())
        try:
            st = json.loads(manifest.read_text())
        except (OSError, ValueError):
            continue
        if st.get("stage") == "B" and st.get("next_bucket", 0) >= int(
            buckets * kill_frac
        ):
            killed_at = st["next_bucket"]
            child.send_signal(signal.SIGKILL)
            break
    child.wait()
    phase1 = time.time() - t0
    if killed_at is None:
        print("child finished before the kill point — raise --kill-frac",
              file=sys.stderr)
        print(child.stdout.read(), file=sys.stderr)
        sys.exit(2)
    print(f"[rehearse] killed at pass-B bucket {killed_at}/{buckets} "
          f"after {phase1:.0f}s", file=sys.stderr)

    # phase 2: resume and finish
    t0 = time.time()
    child = _spawn()
    tail = []
    for line in child.stdout:
        tail.append(line)
        spill_peak = max(spill_peak, _spill_size())
    child.wait()
    phase2 = time.time() - t0
    result_line = next(
        (ln for ln in tail if ln.startswith("CHILD_RESULT ")), None
    )
    if child.returncode != 0 or result_line is None:
        print("".join(tail[-40:]), file=sys.stderr)
        sys.exit(1)
    res = json.loads(result_line[len("CHILD_RESULT "):])
    out = {
        "metric": "bwt_ooc_rehearsal",
        "mbp": mbp,
        "phase1_s": round(phase1, 1),
        "killed_at_bucket": killed_at,
        "n_buckets": buckets,
        "resume_wall_s": round(phase2, 1),
        "spill_peak_gb": round(spill_peak / 1e9, 2),
        **res,
    }
    print(json.dumps(out))
    cache = pathlib.Path(HERE).parent / ".bench_cache.json"
    data = json.loads(cache.read_text()) if cache.exists() else {}
    data[f"ooc_rehearsal_mbp{mbp}"] = out
    cache.write_text(json.dumps(data))
    if own_tmp:
        import shutil

        shutil.rmtree(spill_dir, ignore_errors=True)
    if not res.get("conservation_ok"):
        sys.exit(1)


if __name__ == "__main__":
    main()
