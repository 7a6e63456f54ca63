"""ctypes binding for the native FASTA parser (csrc/fasta_parser.cpp).

Build with tools/build_native.sh; falls back to the NumPy parser when
the shared object is absent. The RANDOM N-policy always uses the NumPy
path so its substitution stream is identical everywhere.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO = os.path.join(os.path.dirname(__file__), "_native.so")
_lib = None


def available() -> bool:
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_SO):
        return False
    lib = ctypes.CDLL(_SO)
    lib.debwt_parse_fasta.restype = ctypes.c_int
    lib.debwt_parse_fasta.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    try:
        lib.debwt_lf_walk.restype = ctypes.c_int64
        lib.debwt_lf_walk.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.debwt_lf_walk_occ.restype = ctypes.c_int64
        lib.debwt_lf_walk_occ.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
    except AttributeError:
        pass   # stale .so without the walk kernels: parser still works
    try:
        lib.debwt_ooc_bin.restype = ctypes.c_int64
        lib.debwt_ooc_bin.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
    except AttributeError:
        pass
    _lib = lib
    return True


def has_ooc_bin() -> bool:
    return available() and hasattr(_lib, "debwt_ooc_bin")


def ooc_bin(hi, lo, c0: int, sep, x2p, N: int, splitters, split_c: int,
            k: int):
    """Native pass-A binner (csrc/ooc_binner.cpp): returns
    (out_hi, out_lo, out_k16, out_pos, counts) with rows grouped
    bucket-contiguously; counts is int64[nb]."""
    import numpy as np

    C_real = hi.shape[0]
    nb = splitters.shape[0] + 1
    assert nb <= 4096
    out_hi = np.empty(C_real, np.uint32)
    out_lo = np.empty(C_real, np.uint32)
    out_k16 = np.empty(C_real, np.uint16)
    out_pos = np.empty(C_real, np.int64)
    counts = np.zeros(nb, np.int64)
    total = _lib.debwt_ooc_bin(
        hi.ctypes.data, lo.ctypes.data, c0, C_real,
        sep.ctypes.data, sep.shape[0],
        x2p.ctypes.data, N,
        splitters.ctypes.data, nb, split_c, k,
        out_hi.ctypes.data, out_lo.ctypes.data,
        out_k16.ctypes.data, out_pos.ctypes.data,
        counts.ctypes.data,
    )
    assert total == counts.sum()
    return out_hi, out_lo, out_k16, out_pos, counts


def has_lf_walk() -> bool:
    return available() and hasattr(_lib, "debwt_lf_walk")


def lf_walk(lf, bwt6, x6, steps: int, start: int) -> int:
    """Native i <- lf[i] walk; returns -1 ok, else first-mismatch text
    position. Arrays must be C-contiguous (int64/uint8/uint8)."""
    return int(_lib.debwt_lf_walk(
        lf.ctypes.data, bwt6.ctypes.data, x6.ctypes.data,
        lf.shape[0], steps, start,
    ))


def lf_walk_occ(bwt6, x6, occ6, cum, sample: int, steps: int,
                start: int) -> int:
    """Native sampled-occ walk (bounded memory); same return contract."""
    import numpy as np

    is_u32 = 1 if occ6.dtype == np.uint32 else 0
    return int(_lib.debwt_lf_walk_occ(
        bwt6.ctypes.data, x6.ctypes.data, occ6.ctypes.data, is_u32,
        cum.ctypes.data, sample, bwt6.shape[0], steps, start,
    ))


def parse_fasta(raw: bytes, policy: str, seed: int):
    if policy == "random":
        from debwt_tpu.io.fasta import NPolicy, _parse_fasta_numpy

        return _parse_fasta_numpy(raw, NPolicy.RANDOM, seed)
    if not available():
        raise ImportError("native parser not built")
    pol = 0 if policy == "reject" else 2
    buf = np.frombuffer(raw, dtype=np.uint8)
    n_cap = int((buf == ord(">")).sum()) + 1
    out_codes = np.empty(buf.shape[0], dtype=np.uint8)
    out_bounds = np.empty(n_cap + 1, dtype=np.int64)
    n_records = ctypes.c_int64(0)
    total = ctypes.c_int64(0)
    err_pos = ctypes.c_int64(0)
    rc = _lib.debwt_parse_fasta(
        buf.ctypes.data, buf.shape[0], pol,
        out_codes.ctypes.data, out_bounds.ctypes.data, n_cap,
        ctypes.byref(n_records), ctypes.byref(total), ctypes.byref(err_pos),
    )
    if rc == -2:
        ch = chr(raw[err_pos.value])
        raise ValueError(
            f"non-ACGT character {ch!r}; rerun with an N-policy "
            "('random' for the transferN behavior, 'to-g' for the "
            "mySort quirk)"
        )
    if rc != 0:
        raise ValueError(f"native FASTA parse failed (rc={rc})")
    nr = n_records.value
    reads = [
        out_codes[out_bounds[j] : out_bounds[j + 1]] for j in range(nr)
    ]
    # names are parsed from headers (cheap, python)
    names = []
    for j, line in enumerate(raw.split(b"\n")):
        if line.startswith(b">"):
            names.append(
                line[1:].split()[0].decode() if len(line) > 1 else f"read{j}"
            )
    return reads, names
