"""FASTA/FASTQ ingest with N-policy.

The reference parses with the vendored kseq.h (src/kseq.h) and demands
N-free input (README "shouldn't contain any uncertain char"), shipping
a separate prep tool that substitutes IUPAC ambiguity codes with random
compatible bases (otherTool/transferN.c). Here both live behind one
reader:

  NPolicy.REJECT — error on any non-ACGT char (reference default)
  NPolicy.RANDOM — transferN-equivalent seeded substitution
                   (otherTool/transferN.c:8-11 randTable)
  NPolicy.TO_G   — map N to G, reproducing the quirk in mySort's
                   private trans table (src/mySort.c:33); other IUPAC
                   codes are still rejected

Parsing is vectorized NumPy over the raw bytes (no per-line Python
loop); a C++ fast path (io/native) is used when built.
"""

from __future__ import annotations

import enum
import gzip
from typing import List, Tuple

import numpy as np

# IUPAC ambiguity codes -> compatible base sets (transferN randTable)
IUPAC = {
    "R": "AG", "Y": "CT", "S": "GC", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG", "N": "ACGT",
}


class NPolicy(enum.Enum):
    REJECT = "reject"
    RANDOM = "random"
    TO_G = "to-g"


_CODE = np.full(256, 255, dtype=np.uint8)
for i, cs in enumerate("ACGT"):
    _CODE[ord(cs)] = i
    _CODE[ord(cs.lower())] = i


def _read_raw(path: str) -> bytes:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        return f.read()


def read_fasta(
    path: str,
    n_policy: NPolicy | str = NPolicy.REJECT,
    seed: int = 0,
) -> Tuple[List[np.ndarray], List[str]]:
    """Parse FASTA/FASTQ (optionally .gz) into per-read uint8 code
    arrays (0..3) plus names. Vectorized over the whole byte buffer."""
    if isinstance(n_policy, str):
        n_policy = NPolicy(n_policy)
    raw = _read_raw(path)
    if not raw:
        raise ValueError(f"empty input: {path}")
    if raw[:1] == b"@":
        return _parse_fastq(raw, n_policy, seed)
    if raw[:1] != b">":
        raise ValueError(f"{path}: not FASTA/FASTQ (starts with {raw[:1]!r})")
    try:
        from debwt_tpu.io import native

        if native.available():
            return native.parse_fasta(raw, n_policy.value, seed)
    except ImportError:
        pass
    return _parse_fasta_numpy(raw, n_policy, seed)


def _parse_fasta_numpy(raw: bytes, n_policy: NPolicy, seed: int):
    buf = np.frombuffer(raw, dtype=np.uint8)
    nl = buf == ord("\n")
    line_starts = np.concatenate([[0], np.nonzero(nl)[0] + 1])
    if line_starts[-1] >= buf.shape[0]:
        line_starts = line_starts[:-1]
    is_header = buf[line_starts] == ord(">")
    header_pos = line_starts[is_header]
    names = []
    reads = []
    # header line ends
    line_ends = np.concatenate([np.nonzero(nl)[0], [buf.shape[0]]])
    # map each line start to its end
    ends_of = line_ends[: line_starts.shape[0]]
    # sequence mask: drop header lines and newlines
    keep = np.ones(buf.shape[0], dtype=bool)
    keep[np.nonzero(nl)[0]] = False
    keep[buf == ord("\r")] = False
    hdr_idx = np.nonzero(is_header)[0]
    for j, h in enumerate(header_pos):
        e = ends_of[hdr_idx[j]]
        names.append(bytes(buf[h + 1 : e]).split()[0].decode()
                     if e > h + 1 else f"read{j}")
        keep[h:e] = False
    seq_all = buf[keep]
    # per-record boundaries: cumulative kept bytes before each header
    keep_cum = np.cumsum(keep)
    rec_start_kept = keep_cum[header_pos] if header_pos.size else np.array([])
    bounds = np.concatenate([rec_start_kept, [seq_all.shape[0]]]).astype(
        np.int64
    )
    codes_all = _encode(seq_all, n_policy, seed)
    for j in range(len(names)):
        reads.append(codes_all[bounds[j] : bounds[j + 1]])
    return reads, names


def _parse_fastq(raw: bytes, n_policy: NPolicy, seed: int):
    # FASTQ: 4-line records (the reference reads these via kseq too)
    names, reads = [], []
    lines = raw.split(b"\n")
    i = 0
    while i + 1 < len(lines):
        if not lines[i].startswith(b"@"):
            break
        names.append(lines[i][1:].split()[0].decode() if len(lines[i]) > 1
                     else f"read{len(names)}")
        seq = np.frombuffer(lines[i + 1], dtype=np.uint8)
        reads.append(_encode(seq, n_policy, seed + len(reads)))
        i += 4
    if not names:
        raise ValueError("no FASTQ records parsed")
    return reads, names


def _encode(seq_bytes: np.ndarray, n_policy: NPolicy, seed: int) -> np.ndarray:
    codes = _CODE[seq_bytes]
    bad = codes == 255
    if not bad.any():
        return codes
    if n_policy is NPolicy.REJECT:
        ch = chr(int(seq_bytes[np.argmax(bad)]))
        raise ValueError(
            f"non-ACGT character {ch!r}; rerun with an N-policy "
            "('random' for the transferN behavior, 'to-g' for the "
            "mySort quirk)"
        )
    if n_policy is NPolicy.TO_G:
        codes = codes.copy()
        isn = (seq_bytes == ord("N")) | (seq_bytes == ord("n"))
        codes[isn] = 2  # the src/mySort.c:33 'N'->G quirk
        still = codes == 255
        if still.any():
            ch = chr(int(seq_bytes[np.argmax(still)]))
            raise ValueError(f"IUPAC code {ch!r} not covered by to-g policy")
        return codes
    # RANDOM: transferN-equivalent seeded substitution
    rng = np.random.default_rng(seed)
    codes = codes.copy()
    upper = np.where(
        (seq_bytes >= ord("a")), seq_bytes - 32, seq_bytes
    ).astype(np.uint8)
    for code_char, bases in IUPAC.items():
        mask = upper == ord(code_char)
        cnt = int(mask.sum())
        if cnt:
            pool = np.frombuffer(bases.encode(), dtype=np.uint8)
            codes[mask] = _CODE[pool[rng.integers(0, len(bases), size=cnt)]]
    still = codes == 255
    if still.any():
        ch = chr(int(seq_bytes[np.argmax(still)]))
        raise ValueError(f"unrecognized sequence character {ch!r}")
    return codes
