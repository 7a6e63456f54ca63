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
import sys
from collections import Counter
src, m, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
seqs, cur = [], []
for line in open(src):
    line = line.strip()
    if line.startswith('>'):
        if cur:
            seqs.append(''.join(cur)); cur = []
    else:
        cur.append(line.upper())
if cur:
    seqs.append(''.join(cur))
c = Counter()
for s in seqs:
    for i in range(len(s) - m + 1):
        c[s[i:i+m]] += 1
with open(out, 'w') as f:
    for kmer, n in c.items():
        f.write(f"{kmer}\t{n}\n")
"""


def reference_available() -> bool:
    return os.path.exists(REF_BINARY) and os.access(REF_BINARY, os.X_OK)


def write_fasta(path, reads, width=70):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i}\n")
            for j in range(0, len(r), width):
                f.write(r[j : j + width] + "\n")


def run_reference(reads, workdir, m=32, threads=1):
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
        timeout=600,
    )
    if not obj.exists():
        raise RuntimeError(
            f"reference run failed (rc={res.returncode}):\n"
            f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
        )
    obj_bytes = obj.read_bytes()
    sharp = np.frombuffer((workdir / "out.bwt.#").read_bytes(), dtype="<u8")
    dollar = np.frombuffer((workdir / "out.bwt.$").read_bytes(), dtype="<u8")
    return obj_bytes, sharp.astype(np.int64), int(dollar[0])
