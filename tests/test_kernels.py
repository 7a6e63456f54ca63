"""Pallas kernel parity tests (interpret mode on CPU).

The window-key kernel must agree exactly with the XLA fallback
(ops.window_keys) — the engine's byte-identical oracle tests then pin
the hardware lowering on TPU runs (DEBWT_TESTS_TPU=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debwt_tpu import ops
from debwt_tpu.kernels.window_keys import TILE, window_keys_pallas


@pytest.mark.parametrize(
    "n_out,w",
    [
        (5000, 32),          # single partial tile, full-width key
        (5000, 31),          # odd width (16+8+4+2+1 decomposition)
        (TILE, 24),          # exactly one tile
        (TILE + 1, 23),      # tile boundary + 1 (halo handoff)
        (3 * TILE + 17, 29), # multi-tile with ragged tail
        (20000, 12),         # minimum reference -k
        (9000, 2),           # minimum kernel width
    ],
)
def test_window_keys_parity(rng, n_out, w):
    x = rng.integers(0, 4, size=n_out + w - 1).astype(np.uint8)
    hi0, lo0 = ops.window_keys(jnp.asarray(x), w)
    hi1, lo1 = window_keys_pallas(jnp.asarray(x), w, n_out)
    np.testing.assert_array_equal(np.asarray(hi0)[:n_out], np.asarray(hi1))
    np.testing.assert_array_equal(np.asarray(lo0)[:n_out], np.asarray(lo1))


def test_window_keys_tail_padding_isolated(rng):
    """Keys in [0, n_out) must not depend on text past n_out + w - 1:
    two sources differing only beyond that bound give identical keys."""
    n_out, w = 6000, 32
    base = rng.integers(0, 4, size=n_out + w - 1 + 500).astype(np.uint8)
    other = base.copy()
    other[n_out + w - 1 :] = (other[n_out + w - 1 :] + 1) % 4
    for arr in (base, other):
        hi, lo = window_keys_pallas(jnp.asarray(arr), w, n_out)
        arr_hi, arr_lo = np.asarray(hi), np.asarray(lo)
        if arr is base:
            ref = (arr_hi, arr_lo)
    np.testing.assert_array_equal(ref[0], arr_hi)
    np.testing.assert_array_equal(ref[1], arr_lo)


# ---------------------------------------------------------------------------
# segmented suffix-OR (kernels/seg_or.py)
# ---------------------------------------------------------------------------


def _seg_or_naive(bits, stop):
    out = np.zeros(bits.shape[0], np.int64)
    acc = 0
    for i in range(bits.shape[0] - 1, -1, -1):
        acc = bits[i] | (0 if stop[i] else acc)
        out[i] = acc
    return out


@pytest.mark.parametrize(
    "R", [1, 127, 8192, 8193, 3 * 8192 + 17, 70001]
)
def test_seg_suffix_or_parity(rng, R):
    from debwt_tpu.kernels.seg_or import seg_suffix_or

    bits = rng.integers(0, 64, size=R).astype(np.int32)
    newseg = rng.random(R) < 0.05
    stop = np.concatenate([newseg[1:], [True]])
    words = bits | (stop.astype(np.int32) << 6)
    want = _seg_or_naive(bits, stop)
    for impl in ("xla", "pallas"):
        got = np.asarray(seg_suffix_or(jnp.asarray(words), impl=impl)) & 63
        np.testing.assert_array_equal(got, want, err_msg=impl)


def test_seg_suffix_or_tile_spanning_segment(rng):
    """One segment spanning many tiles exercises the cross-tile SMEM
    carry chain of the Pallas kernel."""
    from debwt_tpu.kernels.seg_or import seg_suffix_or

    R = 5 * 8192 + 77
    bits = rng.integers(0, 64, size=R).astype(np.int32)
    stop = np.zeros(R, bool)
    stop[-1] = True
    words = bits | (stop.astype(np.int32) << 6)
    want = _seg_or_naive(bits, stop)
    for impl in ("xla", "pallas"):
        got = np.asarray(seg_suffix_or(jnp.asarray(words), impl=impl)) & 63
        np.testing.assert_array_equal(got, want, err_msg=impl)


def _seg_prefix_naive(bits, start):
    out = np.zeros(bits.shape[0], np.int64)
    acc = 0
    for i in range(bits.shape[0]):
        acc = bits[i] | (0 if start[i] else acc)
        out[i] = acc
    return out


@pytest.mark.parametrize(
    "R", [1, 127, 8192, 8193, 3 * 8192 + 17, 70001]
)
def test_seg_prefix_or_parity(rng, R):
    """Forward direction: broadcast from segment-START rows (the
    engine's fact/seg_start broadcast shape: nonzero bits only at
    start rows)."""
    from debwt_tpu.kernels.seg_or import seg_scan_or

    start = rng.random(R) < 0.05
    start[0] = True
    vals = rng.integers(0, 1 << 29, size=R).astype(np.int32)
    bits = np.where(start, vals, 0)
    words = bits | (start.astype(np.int32) << 29)
    want = _seg_prefix_naive(bits, start)
    for impl in ("xla", "pallas"):
        got = np.asarray(
            seg_scan_or(jnp.asarray(words), impl=impl,
                        stop_bit=1 << 29, prefix=True)
        ) & ((1 << 29) - 1)
        np.testing.assert_array_equal(got, want, err_msg=impl)


def test_seg_prefix_or_tile_spanning(rng):
    from debwt_tpu.kernels.seg_or import seg_scan_or

    R = 5 * 8192 + 77
    start = np.zeros(R, bool)
    start[0] = True
    vals = rng.integers(0, 1 << 29, size=R).astype(np.int32)
    bits = np.where(start, vals, 0)
    words = bits | (start.astype(np.int32) << 29)
    want = _seg_prefix_naive(bits, start)
    for impl in ("xla", "pallas"):
        got = np.asarray(
            seg_scan_or(jnp.asarray(words), impl=impl,
                        stop_bit=1 << 29, prefix=True)
        ) & ((1 << 29) - 1)
        np.testing.assert_array_equal(got, want, err_msg=impl)


@pytest.mark.parametrize("R", [64, 8192 + 13, 2 * 8192])
def test_dist_from_sep_matches_naive(rng, R):
    """The engine's dist computation (position-valued suffix OR-carry,
    stop bit 2^29) against a direct searchsorted oracle."""
    import jax

    from debwt_tpu import engine

    sep = np.sort(rng.choice(R, size=max(2, R // 50), replace=False))
    sep[-1] = R - 1
    is_sep = np.zeros(R, bool)
    is_sep[sep] = True
    dist = np.asarray(jax.jit(engine._dist_from_sep, static_argnums=1)(
        jnp.asarray(is_sep), R
    ))
    nxt = sep[np.searchsorted(sep, np.arange(R))]
    np.testing.assert_array_equal(dist, nxt - np.arange(R))
