"""Single-chip end-to-end pipeline orchestration.

Two device dispatches (engine.stage_graph / engine.stage_finish) with
one host sync in between for the dynamic SP/blue counts — the TPU
analogue of the reference's cross-stage globals (case3num,
blueCapacity, ..., src/main.c:83-160). Sidecars, packing, and
conservation counts are computed on device; only the packed words and
tiny metadata cross back to host (the full 6-letter BWT is fetched
lazily on first access).

The unfused stage modules (count/classify/spcode/bluesort/assemble)
remain the building blocks of the distributed pipeline and are tested
in their own right; this path is the single-chip fast path.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from debwt_tpu import constants as K
from debwt_tpu import engine, ops
from debwt_tpu.special import build_special
from debwt_tpu.types import PipelineConfig, SequenceCollection


@dataclasses.dataclass(frozen=True)
class BwtResult:
    sharp_pos: np.ndarray
    dollar_pos: int
    packed_words: np.ndarray | None = None   # uint32 device packing
    _bwt6: Any = None                        # np.ndarray or device array
    _n: int = 0
    # per-stage wall seconds recorded by the producing tier (the
    # reference prints these on every run, src/main.c:86-170; here the
    # CLI --timings flag and bench.py surface them)
    timings: Any = None

    @property
    def bwt6(self) -> np.ndarray:
        b = self._bwt6
        if not isinstance(b, np.ndarray):
            b = np.asarray(jax.device_get(b))[: self._n]
            object.__setattr__(self, "_bwt6", b)
        return b

    @property
    def bwt2(self) -> np.ndarray:
        out = self.bwt6.copy()
        out[out >= 4] = K.T
        return out

    def packed(self) -> bytes:
        if self.packed_words is not None:
            w = np.asarray(jax.device_get(self.packed_words))
            n_words = (self._n + 31) // 32
            if w.shape[0] % 2:
                w = np.concatenate([w, np.zeros(1, np.uint32)])
            u64 = (w[0::2].astype(np.uint64) << np.uint64(32)) | w[
                1::2
            ].astype(np.uint64)
            return u64[:n_words].astype("<u8").tobytes()
        from debwt_tpu.golden import pack_2bit_u64

        return pack_2bit_u64(self.bwt2)


def _pow2(x: int) -> int:
    return max(16, 1 << (int(x) - 1).bit_length())


def _bucket(x: int) -> int:
    """Next eighth-power-of-two >= x (< 25% padding worst case, e.g.
    65 -> 80) — compile-shape bucketing so one compiled program serves
    a range of input sizes."""
    x = max(64, int(x))
    b = (x - 1).bit_length()
    step = 1 << max(0, b - 3)
    return -(-x // step) * step


def _split64(key64: np.ndarray):
    return (
        (key64 >> np.uint64(32)).astype(np.uint32),
        (key64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )


def build_bwt(
    coll: SequenceCollection, config: PipelineConfig | None = None
) -> BwtResult:
    config = config or PipelineConfig()
    trace = os.environ.get("DEBWT_TRACE") == "1"
    timings: dict[str, float] = {}

    def _t(label, t0):
        dt = time.time() - t0
        timings[label] = timings.get(label, 0.0) + dt
        if trace:
            print(f"[debwt-tpu trace] {label:24s} {dt:8.3f}s",
                  file=sys.stderr)
        return time.time()

    t0 = time.time()
    m = config.m
    N = coll.bwt_len
    n = coll.n_reads
    # int32 fast path holds to R = N_cap + ns_cap < 2^29 (the packed
    # fact-broadcast/scatter bound in engine.stage_graph; n_spec is
    # exactly n_reads*k). Larger texts route to the distributed /
    # out-of-core tiers via api.build (see api.py).
    if _bucket(N) + _pow2(n * (m - 1)) >= (1 << 29):
        raise NotImplementedError(
            "int32 pipeline: text must be < ~512 Mbp (R < 2^29 rows); "
            "use debwt_tpu.api.build, which routes large collections to "
            "the multi-device / out-of-core tiers"
        )

    # ---- host: special module (tiny, irregular) ----
    sp = build_special(coll, m)
    t0 = _t("special module (host)", t0)
    N_cap = _bucket(N)
    from debwt_tpu.special import _cached_buf

    x2p = _cached_buf("pipe_x2p", N_cap + K.TAIL_PAD)
    x2p[:N] = coll.x2
    x2p[N:] = K.T
    s_hi, s_lo = _split64(sp.spec_tfill)

    def _padded(a, cap, fill):
        out = np.full(cap, fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return jnp.asarray(out)

    n_spec = s_hi.shape[0]
    ns_cap = _pow2(n_spec)
    d = jnp.asarray
    # 2-bit packed text transfer: 4x less host->device traffic
    x2w_d = d(ops.pack_2bit_words_host(x2p))
    spec_branch_d = _padded(
        sp.spec_branch_pos.astype(np.int32),
        _pow2(max(1, sp.spec_branch_pos.shape[0])), N_cap,
    )
    out = engine.stage_graph(
        x2w_d,
        _padded(coll.sep.astype(np.int32), _pow2(n), N_cap),
        _padded(s_hi, ns_cap, np.uint32(0xFFFFFFFF)),
        _padded(s_lo, ns_cap, np.uint32(0xFFFFFFFF)),
        _padded(sp.spec_bwt6, ns_cap, 0),
        spec_branch_d,
        jnp.int32(N),
        m, N_cap,
    )
    (bwt6_partial, ev_key, mi_row, seg_start, r_pos,
     bwt_char, L, B, x2p_d) = out
    L, B = int(L), int(B)
    t0 = _t("stage_graph (+h2d, sync)", t0)
    # eighth-power buckets (like N_cap), not powers of two: at 140 Mbp
    # the measured L is 22M and _pow2 would pad every L-sized array
    # (the rank loop's sorts, the merged count) by 53%
    L_cap, B_cap = _bucket(L), _bucket(B)

    bwt6_d, packed_d, sharp_d, dollar_d, n_sharp_d, counts_d = (
        engine.stage_finish(
            x2p_d, ev_key, mi_row, seg_start, r_pos, bwt_char,
            bwt6_partial, spec_branch_d, jnp.int32(N),
            m, N_cap, L_cap, B_cap, _pow2(n),
        )
    )
    sharp = np.asarray(jax.device_get(sharp_d)).astype(np.int64)
    dollar = int(dollar_d)
    t0 = _t("stage_finish (+sync)", t0)
    n_sharp = int(n_sharp_d)
    assert n_sharp == n - 1, (n_sharp, n)
    assert (sharp[: n - 1] < N).all()
    assert dollar < N
    if config.check:
        counts = np.asarray(jax.device_get(counts_d))
        want = np.bincount(coll.x6, minlength=6)
        assert (counts == want).all(), (counts, want)
    return BwtResult(
        sharp_pos=sharp[: n - 1],
        dollar_pos=dollar,
        packed_words=packed_d,
        _bwt6=bwt6_d,
        _n=N,
        timings=timings,
    )
