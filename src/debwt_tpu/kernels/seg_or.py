"""Pallas TPU kernel: segmented suffix-OR in one HBM pass.

stage_graph's per-node facts are PRESENCE tests ("does pred class c /
a head row / a multi-out indicator occur anywhere in my segment?",
reference semantics: the per-node tagging of mergeKmer,
src/INandOut.c:252-445). The XLA form costs one reverse-cummin scan
per fact column (6 columns) plus a boundary scan — each a full
read+write HBM pass over the R-sized row array, and on the axon
remote-compile service each scan op also costs ~15-25 s of COMPILE
time. This kernel computes all six facts in ONE pass.

Formulation: pack the fact bits of row i into a word, plus a STOP bit
(bit 6) meaning "row i is the last row of its segment" (stop[i] =
newseg[i+1]; the global last row must carry it). The segmented suffix
recurrence

    out[i] = bits[i] | (stop[i] ? 0 : out[i+1])

has the associative lifting  combine(a, b) = a | (a & STOP ? 0 : b)
— the stop bit ORs through exactly like a fact bit, so ONE int32 word
carries the whole scan state. A Hillis-Steele sweep over the
flattened (ROWS, 128) tile (log2(TILE) = 13 steps, all in VMEM via
lane/sublane rolls) produces tile-local suffixes; a carry scalar in
SMEM propagates the partially-open rightmost segment across tiles,
with the grid walking blocks RIGHT-TO-LEFT (TPU grids execute
sequentially, so cross-step scratch is a legal carry channel).

At segment-START rows, out[i] is the full segment OR: popcount of the
pred bits gives the distinct-in-degree, bit 4 gives head membership,
bit 5 gives multi-out — everything engine.stage_graph needs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 64
TILE = ROWS * LANES
STOP = 1 << 6


def _flatshift(x, s: int, lane):
    """Row-major flat left-shift by s (s < 128 or s % 128 == 0):
    out[r, l] = flat[r*128 + l + s], wrapping at the tile edge (the
    caller masks wrapped elements). Rolls only — no unaligned
    cross-lane slices (see kernels/window_keys.py)."""
    if s == 0:
        return x
    if s % LANES == 0:
        return pltpu.roll(x, x.shape[0] - s // LANES, 0)
    assert s < LANES, s
    same = pltpu.roll(x, LANES - s, 1)
    nxt = pltpu.roll(pltpu.roll(x, x.shape[0] - 1, 0), LANES - s, 1)
    return jnp.where(lane < LANES - s, same, nxt)


EDGE = 1 << 7   # in-kernel only: "suffix ran off the tile edge"


def _kernel(w_ref, out_ref, carry_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES + lane
    )
    w = w_ref[:]
    # Hillis-Steele segmented suffix OR within the tile. Absorption
    # stops at a real segment end (STOP) or at the tile edge (EDGE, a
    # distinct bit — carried in by the edge mask): only suffixes that
    # reached the EDGE without a STOP belong to a segment that crosses
    # into the next tile, and only those take the carry.
    s = 1
    while s < TILE:
        shifted = _flatshift(w, s, lane)
        shifted = jnp.where(flat + s < TILE, shifted, EDGE)
        w = w | jnp.where((w & (STOP | EDGE)) != 0, 0, shifted)
        s *= 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[0] = 0

    carry = carry_ref[0]
    out = w | jnp.where((w & STOP) != 0, 0, carry)
    out_ref[:] = out
    # the next grid step processes the tile to the LEFT: its carry is
    # this tile's first suffix value (facts only — the stop/edge bits
    # must not leak across; absorption already accounted for them)
    carry_ref[0] = out[0, 0] & (STOP - 1)


def _seg_suffix_or_xla(words, R: int):
    """XLA fallback: the same log-shift sweep over the full array
    (used off-TPU; identical results by construction)."""
    s = 1
    while s < R:
        shifted = jnp.concatenate(
            [words[s:], jnp.full(min(s, R), STOP, jnp.int32)]
        )[:R]
        words = words | jnp.where((words & STOP) != 0, 0, shifted)
        s *= 2
    return words


@functools.partial(jax.jit, static_argnames=("impl",))
def seg_suffix_or(words: jnp.ndarray, impl: str = "auto"):
    """out[i] = OR of fact bits (0..5) over [i, end of i's segment].

    words: int32[R], bits 0..5 = facts, bit 6 = STOP (last row of the
    segment; the global last row MUST have it set). Returns int32[R]
    with the segment-suffix OR in bits 0..5.

    impl: "auto" (Pallas on TPU, XLA sweep elsewhere), "pallas"
    (force the kernel — interpreted off-TPU, for parity tests), or
    "xla".
    """
    R = words.shape[0]
    if impl == "auto":
        on_tpu = (
            jax.default_backend() == "tpu"
            and os.environ.get("DEBWT_NO_PALLAS") != "1"
        )
        impl = "pallas" if on_tpu else "xla"
    if impl == "xla":
        return _seg_suffix_or_xla(words, R)
    interpret = jax.default_backend() != "tpu"
    n_blocks = -(-R // TILE)
    pad = n_blocks * TILE - R
    # padding rows: stop set, no facts — they never contaminate, and
    # the rightmost tile's carry is initialized inside the kernel
    w = jnp.concatenate([words, jnp.full(pad, STOP, jnp.int32)])
    w2d = w.reshape(-1, LANES)
    out = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (n_blocks - 1 - i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, LANES), lambda i: (n_blocks - 1 - i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * ROWS, LANES), jnp.int32, vma=jax.typeof(w2d).vma
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(w2d)
    return out.reshape(-1)[:R]
