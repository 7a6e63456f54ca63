"""On-TPU smoke lane: run the real Mosaic lowerings on silicon.

The CPU suite exercises every kernel in interpret mode only; round 3
shipped a kernel that passed interpret parity and crashed on hardware
re-execution (VERDICT r03). This lane converts "works in interpret
mode" into "works on silicon": kernel parity with interpret=False at
>= 2^17 rows, a branch-dense REPEAT-CALL pipeline case at a size where
the big_l/big_b paths engage (the exact shape that crashed), and an
oracle-parity run >= 1 Mbp against the reference ELF.

Run:  DEBWT_TESTS_TPU=1 python -m pytest tests/test_tpu_smoke.py -v
(conftest.py forces CPU without the env; this module self-skips when
the backend is not a real TPU.)
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU smoke lane (set DEBWT_TESTS_TPU=1 on a TPU host)",
)


# ---------------------------------------------------------------------------
# kernel parity on device (interpret=False)
# ---------------------------------------------------------------------------


def test_seg_or_tpu_parity(rng):
    from debwt_tpu.kernels.seg_or import seg_scan_or, seg_suffix_or

    R = (1 << 17) + 777
    bits = rng.integers(0, 64, size=R).astype(np.int32)
    stop = (rng.random(R) < 0.02).astype(np.int32)
    words = jnp.asarray(bits | (stop << 6))
    want = np.asarray(seg_suffix_or(words, impl="xla")) & 63
    got = np.asarray(seg_suffix_or(words, impl="pallas")) & 63
    np.testing.assert_array_equal(got, want)

    start = np.zeros(R, bool)
    start[0] = True
    start[rng.integers(1, R, size=200)] = True
    vals = rng.integers(0, 1 << 20, size=R).astype(np.int32)
    w2 = jnp.asarray(
        np.where(start, vals | (1 << 29), 0).astype(np.int32)
    )
    want = np.asarray(
        seg_scan_or(w2, impl="xla", stop_bit=1 << 29, prefix=True)
    )
    got = np.asarray(
        seg_scan_or(w2, impl="pallas", stop_bit=1 << 29, prefix=True)
    )
    np.testing.assert_array_equal(got & ((1 << 29) - 1),
                                  want & ((1 << 29) - 1))


def test_window_keys_tpu_parity(rng):
    from debwt_tpu import ops

    P = (1 << 17) + 333
    w = 32
    x2 = rng.integers(0, 4, size=P).astype(np.uint8)
    hi, lo = ops.window_keys(jnp.asarray(x2), w)   # Pallas on TPU
    hi, lo = np.asarray(hi), np.asarray(lo)
    # host expectation via uint64 horner over the windows
    n_out = P - w + 1
    acc = np.zeros(n_out, dtype=np.uint64)
    for i in range(w):
        acc = (acc << np.uint64(2)) | x2[i : i + n_out].astype(np.uint64)
    key = acc
    np.testing.assert_array_equal(hi, (key >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(
        lo, (key & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    )


# ---------------------------------------------------------------------------
# pipeline on device
# ---------------------------------------------------------------------------


def _branch_dense_reads(mbp: float, n_genomes: int = 4, seed: int = 7):
    """Near-identical mutated genome copies — dense SP stream, deep
    blue-sort ties (the bench's synth_reads shape, the input class
    that crashed round 3 on call 2)."""
    rng = np.random.default_rng(seed)
    per = int(mbp * 1e6) // n_genomes
    base = rng.integers(0, 4, size=per).astype(np.uint8)
    bases = np.array(list("ACGT"))
    reads = []
    for g in range(n_genomes):
        gen = base.copy()
        if g:
            idx = rng.choice(per, size=max(1, int(per * 2e-3)), replace=False)
            gen[idx] = (gen[idx] + rng.integers(1, 4, size=idx.size)) % 4
        reads.append("".join(bases[gen]))
    return reads


def test_pipeline_repeat_branch_dense():
    """build_bwt three times on a branch-dense input big enough to
    engage the big_l/big_b stage_finish paths (R >= 2^20); every call
    must succeed and agree."""
    from debwt_tpu.pipeline import build_bwt
    from debwt_tpu.types import PipelineConfig, SequenceCollection

    reads = _branch_dense_reads(1.6)
    coll = SequenceCollection.from_reads(reads)
    config = PipelineConfig(m=32)
    first = None
    for rep in range(3):
        res = build_bwt(coll, config)
        packed = res.packed()
        if first is None:
            first = (packed, res.sharp_pos.copy(), res.dollar_pos)
        else:
            assert packed == first[0], f"rep {rep}: packed BWT differs"
            np.testing.assert_array_equal(res.sharp_pos, first[1])
            assert res.dollar_pos == first[2]
    # conservation: per-char counts match the input
    bwt6 = res.bwt6
    want = np.bincount(coll.x6, minlength=6)
    got = np.bincount(bwt6, minlength=6)
    np.testing.assert_array_equal(got, want)


def test_oracle_parity_1mbp_tpu():
    """Byte parity vs the reference ELF at >= 1 Mbp on the device
    pipeline (the CPU oracle suite tops out at ~2.4 kbp reads)."""
    import tempfile

    from oracle.harness import run_reference

    from debwt_tpu.pipeline import build_bwt
    from debwt_tpu.types import PipelineConfig, SequenceCollection

    reads = _branch_dense_reads(1.2, seed=13)
    with tempfile.TemporaryDirectory() as td:
        obj, sharp, dollar = run_reference(reads, td, m=32, threads=8,
                                           timeout=600)
    coll = SequenceCollection.from_reads(reads)
    res = build_bwt(coll, PipelineConfig(m=32))
    assert res.packed() == obj
    np.testing.assert_array_equal(
        res.sharp_pos.astype(np.int64), np.asarray(sharp, dtype=np.int64)
    )
    assert res.dollar_pos == int(dollar)
