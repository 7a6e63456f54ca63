"""Pallas TPU kernel: fused w-window 2-bit key extraction.

Computes, for every position p, the (hi, lo) uint32 pair of the
right-aligned 2-bit key of the w-char window x2p[p : p + w] — the core
primitive behind edge/node key construction (the reference extracts
windows per-position from packed u64 words, src/collect#$.c:243-251).

The XLA fallback (ops.window_keys) builds the keys by logarithmic
doubling over full-length arrays: each doubling level materializes an
N-word intermediate, so the build is ~5 read+write HBM passes. This
kernel performs the same log-doubling entirely in VMEM per (ROWS, 128)
tile — one HBM read of the text tile, one write of each output — so it
is HBM-bound at the theoretical minimum traffic.

Layout strategy (v5e-safe): positions are tiled row-major into
(ROWS, 128) uint32 tiles. The "value at position p + s" lookahead is a
*flat* shift, decomposed into TPU-native ops only:

    flatshift(X, s)[r, l] = X[r, l+s]          if l + s < 128
                            X[r+1, l+s-128]    otherwise

implemented as two lane-rolls (`pltpu.roll(axis=1)`), one sublane-roll
(`axis=0`), and a lane-index select — no unaligned cross-lane slices
(an earlier revision used `lax.slice` on the flattened tile, which
lowered incorrectly on v5e for offsets > 2; rolls lower correctly).
The tile carries HALO_ROWS extra rows so lookaheads up to 128 chars
never read wrapped garbage inside the emitted region.

Wired into ops.window_keys for w in [2, 32] on TPU backends (set
DEBWT_NO_PALLAS=1 to force the XLA fallback); parity is pinned by
tests in interpret mode and by the engine's byte-identical oracle
tests on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANES = 128
ROWS = 64          # 64 x 128 = 8192 positions per grid step
TILE = ROWS * LANES
HALO_ROWS = 8      # sublane-aligned halo: 1024 chars of lookahead
ALL_ROWS = ROWS + HALO_ROWS


def _flatshift(x, s: int, lane):
    """x viewed as a row-major flat array, shifted left by s (< 128):
    out[r, l] = flat[r*128 + l + s]. The last rows read wrapped values
    (callers keep >= s/128 + 1 halo rows so emitted rows are exact)."""
    from jax.experimental.pallas import tpu as pltpu

    if s == 0:
        return x
    # pltpu.roll requires non-negative shifts; a left-shift by s is a
    # roll by (size - s) under jnp.roll semantics (out[i] = in[i-shift])
    same = pltpu.roll(x, LANES - s, 1)
    nxt = pltpu.roll(pltpu.roll(x, x.shape[0] - 1, 0), LANES - s, 1)
    return jnp.where(lane < LANES - s, same, nxt)


def _kernel(w: int, x_ref, halo_ref, hi_ref, lo_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (ALL_ROWS, LANES), 1)
    t = jnp.concatenate([x_ref[:], halo_ref[:]], axis=0)
    # log-doubling in VMEM: d[j][r, l] = 2-bit key of the j-char window
    # starting at flat position r*128 + l (j <= 16 fits one u32)
    d = {1: t}
    j = 1
    while 2 * j <= min(w, 16):
        d[2 * j] = (d[j] << (2 * j)) | _flatshift(d[j], j, lane)
        j *= 2
    parts = []
    rem = w
    for q in (16, 8, 4, 2, 1):
        while rem >= q and q in d:
            parts.append(q)
            rem -= q
    assert rem == 0, (w, parts)
    off = parts[0]
    hi = jnp.zeros((ALL_ROWS, LANES), jnp.uint32)
    lo = d[parts[0]]
    for q in parts[1:]:
        chunk = _flatshift(d[q], off, lane)
        s = 2 * q
        if s == 32:
            hi, lo = lo, chunk
        else:
            hi = (hi << s) | (lo >> (32 - s))
            lo = (lo << s) | chunk
        off += q
    hi_ref[:] = hi[:ROWS]
    lo_ref[:] = lo[:ROWS]


@functools.partial(jax.jit, static_argnames=("w", "n_out", "interpret"))
def window_keys_pallas(
    x2p: jnp.ndarray, w: int, n_out: int, interpret: bool | None = None
):
    """(hi, lo) uint32[n_out] window keys, key(p) right-aligned in the
    64-bit (hi, lo) pair. x2p must have at least n_out + w - 1
    elements; values 0..3."""
    from jax.experimental import pallas as pl

    assert 2 <= w <= 32, w
    # halo covers the longest flatshift: off + q <= w <= 32 < 128
    assert ROWS % HALO_ROWS == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_blocks = -(-n_out // TILE)
    pad_len = n_blocks * TILE + HALO_ROWS * LANES
    x = jnp.zeros(pad_len, jnp.uint32)
    take = min(x2p.shape[0], pad_len)
    x = x.at[:take].set(x2p[:take].astype(jnp.uint32))
    x2d = x.reshape(-1, LANES)

    hi, lo = pl.pallas_call(
        functools.partial(_kernel, w),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            # halo: the HALO_ROWS rows right after block i's main tile
            pl.BlockSpec(
                (HALO_ROWS, LANES),
                lambda i: ((i + 1) * (ROWS // HALO_ROWS), 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
        ],
        out_shape=[
            # propagate the input's varying-mesh-axes set so the kernel
            # also works per-shard inside shard_map (check_vma)
            jax.ShapeDtypeStruct(
                (n_blocks * ROWS, LANES), jnp.uint32,
                vma=jax.typeof(x2d).vma,
            ),
            jax.ShapeDtypeStruct(
                (n_blocks * ROWS, LANES), jnp.uint32,
                vma=jax.typeof(x2d).vma,
            ),
        ],
        interpret=interpret,
    )(x2d, x2d)
    return hi.reshape(-1)[:n_out], lo.reshape(-1)[:n_out]
