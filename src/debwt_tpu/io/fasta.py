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


def read_collection(
    path: str,
    n_policy: NPolicy | str = NPolicy.REJECT,
    seed: int = 0,
    chunk_bytes: int = 1 << 26,
):
    """Stream a FASTA/FASTQ file (optionally .gz) straight into a
    SequenceCollection: chunked reading (no whole-file slurp, gz
    decompressed incrementally), vectorized per-chunk parsing, and no
    per-read Python objects — peak memory is the 2-bit-codes output
    plus one chunk, not 2x the raw file. This is the scale path the
    CLI uses; `read_fasta` remains the convenience API when per-read
    arrays/names are wanted.

    The reference's analogue is kseq.h's buffered streaming
    (src/kseq.h:36-90) feeding collect's two-pass packer
    (src/collect#$.c:37-90); here one pass suffices because code
    chunks are accumulated and concatenated once.
    """
    from debwt_tpu.types import SequenceCollection

    if isinstance(n_policy, str):
        n_policy = NPolicy(n_policy)
    opener = gzip.open if str(path).endswith(".gz") else open
    chunks: List[np.ndarray] = []    # per-region code arrays
    bound_parts: List[np.ndarray] = []  # read-start offsets, global
    base = 0                          # total kept (code) bytes so far
    lines_seen = 0                    # FASTQ phase carry
    region_i = 0
    fmt = None
    carry = b""

    def _region(region: bytes):
        nonlocal base, lines_seen, region_i
        buf = np.frombuffer(region, dtype=np.uint8)
        starts, ends = _line_table(buf)
        if starts.size == 0:
            return
        if fmt == "fasta":
            is_rec = buf[starts] == ord(">")
            is_body = ~is_rec
        else:
            phase = (lines_seen + np.arange(starts.shape[0])) % 4
            is_rec = phase == 1       # the sequence line IS the record
            is_body = is_rec
            lines_seen += starts.shape[0]
        keep = _span_mask(buf, starts[is_body], ends[is_body])
        # kept length per line (line body minus CRs) -> record starts
        # by a LINE-level cumsum; no per-byte int64 scan
        crs = np.nonzero(buf == ord("\r"))[0]
        body_len = ends - starts
        if crs.size:
            body_len = body_len - (
                np.searchsorted(crs, ends) - np.searchsorted(crs, starts)
            )
        body_len = np.where(is_body, body_len, 0)
        line_off = np.concatenate([[0], np.cumsum(body_len)[:-1]])
        rec_off = line_off[is_rec]
        codes = _encode(buf[keep], n_policy, seed + region_i)
        bound_parts.append(base + rec_off)
        chunks.append(codes)
        base += codes.shape[0]
        region_i += 1

    with opener(path, "rb") as f:
        while True:
            data = f.read(chunk_bytes)
            if not data:
                break
            buf = carry + data
            if fmt is None:
                if buf[:1] == b"@":
                    fmt = "fastq"
                elif buf[:1] == b">":
                    fmt = "fasta"
                else:
                    raise ValueError(
                        f"{path}: not FASTA/FASTQ (starts with {buf[:1]!r})"
                    )
            cut = buf.rfind(b"\n") + 1
            if cut == 0:
                carry = buf
                continue
            carry = buf[cut:]
            _region(buf[:cut])
    if carry:
        _region(carry + b"\n")
    if fmt is None:
        raise ValueError(f"empty input: {path}")
    codes = (np.concatenate(chunks) if chunks
             else np.zeros(0, dtype=np.uint8))
    starts_all = (np.concatenate(bound_parts) if bound_parts
                  else np.zeros(0, dtype=np.int64))
    if starts_all.size == 0:
        raise ValueError(f"no records parsed from {path}")
    lengths = np.diff(np.concatenate([starts_all, [codes.shape[0]]]))
    return SequenceCollection.from_concat(codes, lengths)


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


def _line_table(buf: np.ndarray):
    """(starts, ends) of every newline-terminated line in buf; a final
    unterminated line is included with end = len(buf)."""
    nl = np.nonzero(buf == ord("\n"))[0]
    starts = np.concatenate([[0], nl + 1]).astype(np.int64)
    ends = np.concatenate([nl, [buf.shape[0]]]).astype(np.int64)
    if starts[-1] >= buf.shape[0]:
        starts, ends = starts[:-1], ends[:-1]
    return starts, ends[: starts.shape[0]]


def _span_mask(buf: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Boolean mask covering [starts_i, ends_i) spans, minus CRs —
    one delta pass instead of a per-span Python loop. Spans never nest
    (they are disjoint line bodies), so int8 accumulators suffice and
    transients stay ~3x the buffer, not 8x."""
    delta = np.zeros(buf.shape[0] + 1, dtype=np.int8)
    delta[starts] = 1
    delta[ends] -= 1          # an end never equals another span's start
    keep = np.cumsum(delta[:-1], dtype=np.int8) > 0
    keep[buf == ord("\r")] = False
    return keep


def _parse_fastq(raw: bytes, n_policy: NPolicy, seed: int):
    # FASTQ: 4-line records (the reference reads these via kseq too).
    # Vectorized: one pass builds the line table, a delta-mask extracts
    # all sequence lines at once (no per-record Python loop over reads,
    # no raw.split memory doubling).
    buf = np.frombuffer(raw, dtype=np.uint8)
    starts, ends = _line_table(buf)
    phase = np.arange(starts.shape[0]) % 4
    is_seq = phase == 1
    if not is_seq.any():
        raise ValueError("no FASTQ records parsed")
    keep = _span_mask(buf, starts[is_seq], ends[is_seq])
    codes_all = _encode(buf[keep], n_policy, seed)
    excl = np.zeros(buf.shape[0] + 1, dtype=np.int64)
    np.cumsum(keep, out=excl[1:])
    bounds = np.concatenate([excl[starts[is_seq]], [codes_all.shape[0]]])
    reads = [codes_all[bounds[j] : bounds[j + 1]]
             for j in range(bounds.shape[0] - 1)]
    hdr_s, hdr_e = starts[phase == 0], ends[phase == 0]
    names = []
    for j in range(len(reads)):
        h = bytes(buf[hdr_s[j] + 1 : hdr_e[j]]).split()
        names.append(h[0].decode() if h else f"read{j}")
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
