"""Oracle harness: run the reference deBWT ELF binary without Jellyfish.

The reference shells out to `bash $BIN/src/kmercounting.sh` where $BIN is
the directory of the deBWT binary (src/main.c:70-75,188-193). We stage
the binary into a scratch directory alongside a replacement script that
produces the Jellyfish text-dump format (`kmer\\tcount` lines,
consumed by fscanf "%s%lu" at src/mySort.c:54) with an exact Python
counter, then byte-compare outputs.
"""

from __future__ import annotations

import os
import pathlib
import shutil
import subprocess
import sys
from collections import Counter

import numpy as np

REF_BINARY = "/root/reference/deBWT"

_COUNTER_SNIPPET = r"""
# Vectorized stand-in for `jellyfish count + dump -c -t`: emits
# `kmer\tcount` lines. Counts are zero-padded to a fixed width so the
# whole dump is one fixed-stride byte matrix (fscanf %lu at
# src/mySort.c:54 parses leading zeros as plain decimal).
import sys
import numpy as np
src, m, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
buf = np.frombuffer(open(src, 'rb').read(), np.uint8)
nl = np.nonzero(buf == 10)[0]
starts = np.concatenate([[0], nl + 1])
if starts[-1] >= buf.shape[0]:
    starts = starts[:-1]
ends = np.concatenate([nl, [buf.shape[0]]])[: starts.shape[0]]
is_hdr = buf[starts] == ord('>')
keep = np.ones(buf.shape[0], bool)
keep[buf == 10] = False
keep[buf == 13] = False
for h, e in zip(starts[is_hdr], ends[is_hdr]):
    keep[h:e] = False
kept_cum = np.cumsum(keep)
rec_start = kept_cum[starts[is_hdr]]          # kept bytes before header
seq = buf[keep]
lut = np.full(256, 255, np.uint8)
for i, ch in enumerate(b'ACGT'):
    lut[ch] = i
    lut[ch + 32] = i
codes = lut[seq]
assert not (codes == 255).any(), 'non-ACGT char in counter input'
L = codes.shape[0]
bounds = np.concatenate([rec_start, [L]]).astype(np.int64)
P = L - m + 1
if P <= 0:
    open(out, 'w').close(); sys.exit(0)
keys = np.zeros(P, np.uint64)
c64 = codes.astype(np.uint64)
for j in range(m):
    keys = (keys << np.uint64(2)) | c64[j : j + P]
pos = np.arange(P, dtype=np.int64)
rid = np.searchsorted(bounds, pos, side='right')
valid = pos + m <= bounds[rid]
u, c = np.unique(keys[valid], return_counts=True)
w = max(1, len(str(int(c.max()))))
n = u.shape[0]
mat = np.empty((n, m + 1 + w + 1), np.uint8)
b = np.frombuffer(b'ACGT', np.uint8)
for j in range(m):
    mat[:, j] = b[((u >> np.uint64(2 * (m - 1 - j))) & np.uint64(3)).astype(np.int64)]
mat[:, m] = 9
d = c.astype(np.int64)
for j in range(w):
    mat[:, m + 1 + j] = (d // 10 ** (w - 1 - j)) % 10 + ord('0')
mat[:, -1] = 10
open(out, 'wb').write(mat.tobytes())
"""


def reference_available() -> bool:
    return os.path.exists(REF_BINARY) and os.access(REF_BINARY, os.X_OK)


def write_fasta(path, reads, width=70):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i}\n")
            for j in range(0, len(r), width):
                f.write(r[j : j + width] + "\n")


def parse_stage_times(stdout: str) -> float:
    """Sum of the binary's own per-stage wall times (src/main.c prints
    one line per stage) — the reference's post-counting pipeline time,
    free of the fake-Jellyfish counter's run-to-run variance."""
    import re

    pats = [
        r"read kmercounting results time \(txt transfer\): ([\d.]+)",
        r"distributing time = ([\d.]+)",
        r"sort time is ([\d.]+)",
        r"collect#\$ and getKmer time is ([\d.]+)",
        r"generate blocks time is ([\d.]+)",
        r"generate SP time is ([\d.]+)",
        r"Sort blue time is ([\d.]+)",
        r"merge case time: ([\d.]+)",
    ]
    total = 0.0
    for pat in pats:
        mt = re.search(pat, stdout)
        if mt:
            total += float(mt.group(1))
    return total


def run_reference(reads, workdir, m=32, threads=1, timeout=600,
                  return_times=False):
    # threads=1 by default: the reference's multi-thread SP stitch reads
    # out of bounds (multiCatSP, src/generateSP.c:356 — tempSP[num][-1])
    # whenever a thread segment has fewer than 32 SP events, corrupting
    # spCode word 0. Tiny test inputs trigger it; realistic genomes
    # (>=32 branch events per thread segment) do not. We compare against
    # the uncorrupted semantics.
    """Run the reference binary; returns (obj_bytes, sharp_u64s, dollar_u64)."""
    workdir = pathlib.Path(workdir)
    bindir = workdir / "bin"
    (bindir / "src").mkdir(parents=True, exist_ok=True)
    binary = bindir / "deBWT"
    if not binary.exists():
        shutil.copy(REF_BINARY, binary)
        binary.chmod(0o755)
    counter = workdir / "fake_jellyfish.py"
    counter.write_text(_COUNTER_SNIPPET)
    script = bindir / "src" / "kmercounting.sh"
    script.write_text(
        "#!/bin/sh\n"
        f'exec {sys.executable} {counter} "$1" "$5" "$3/out"\n'
    )
    script.chmod(0o755)
    fasta = workdir / "input.fa"
    write_fasta(fasta, reads)
    obj = workdir / "out.bwt"
    res = subprocess.run(
        [str(binary), "-o", str(obj), "-t", str(threads), "-k", str(m),
         "-j", "/unused", str(fasta)],
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if not obj.exists():
        raise RuntimeError(
            f"reference run failed (rc={res.returncode}):\n"
            f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
        )
    obj_bytes = obj.read_bytes()
    sharp = np.frombuffer((workdir / "out.bwt.#").read_bytes(), dtype="<u8")
    dollar = np.frombuffer((workdir / "out.bwt.$").read_bytes(), dtype="<u8")
    if return_times:
        return (obj_bytes, sharp.astype(np.int64), int(dollar[0]),
                parse_stage_times(res.stdout + res.stderr))
    return obj_bytes, sharp.astype(np.int64), int(dollar[0])
