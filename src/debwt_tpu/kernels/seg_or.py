"""Pallas TPU kernels: segmented OR-carry scans in one HBM pass.

Two directions of the same recurrence (reference semantics being
replaced: the per-node tagging of mergeKmer, src/INandOut.c:252-445,
and its running-coordinate bookkeeping):

  suffix:  out[i] = bits[i] | (stop[i] ? 0 : out[i+1])
  prefix:  out[i] = bits[i] | (stop[i] ? 0 : out[i-1])

Both have the associative lifting  combine(a, b) = a | (a & STOP ? 0 : b)
— the stop bit ORs through exactly like a fact bit, so ONE int32 word
carries the whole scan state. These replace XLA cummax/cummin sweeps,
each of which costs a full HBM read+write pass over the R-sized row
array AND ~20-30 s of compile time per scan on the axon service; the
kernels compile in <1 s and run at one-HBM-pass speed.

Uses in the engine:
  * seg_suffix_or(bits|stop at segment END): at segment-START rows the
    result is the full segment OR of the fact bits — presence facts
    ("does pred class c / a head row / a multi-out indicator occur in
    my segment?") for all six facts in one pass.
  * seg_prefix_or(value at segment-START rows, stop at START rows):
    broadcasts the start row's word (e.g. idx<<4 | facts) to every row
    of its segment — non-start rows carry 0 bits, so OR-carry equals
    the start value.
  * seg_suffix_or with stop_bit 1<<29 (engine.POS_STOP) and bits =
    separator-position at separator rows: every row learns the
    position of the next separator at or after it (the engine's dist
    computation).

Formulation: a Hillis-Steele sweep over the flattened (ROWS, 128)
tile (log2(TILE) = 13 steps, all in VMEM via lane/sublane rolls)
produces tile-local scans; a carry scalar in SMEM propagates the
partially-open boundary segment across tiles, with the grid walking
blocks RIGHT-TO-LEFT for the suffix direction and LEFT-TO-RIGHT for
the prefix direction (TPU grids execute sequentially, so cross-step
scratch is a legal carry channel).
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


def _flatshift(x, s: int, lane, reverse: bool):
    """Row-major flat shift by s (s < 128 or s % 128 == 0).
    forward (reverse=False): out[r, l] = flat[r*128 + l + s]
    backward (reverse=True): out[r, l] = flat[r*128 + l - s]
    wrapping at the tile edge (the caller masks wrapped elements).
    Rolls only — no unaligned cross-lane slices (see
    kernels/window_keys.py)."""
    if s == 0:
        return x
    nrow = x.shape[0]
    if s % LANES == 0:
        r = s // LANES
        return pltpu.roll(x, r if reverse else nrow - r, 0)
    assert s < LANES, s
    if reverse:
        same = pltpu.roll(x, s, 1)
        prv = pltpu.roll(pltpu.roll(x, 1, 0), s, 1)
        return jnp.where(lane >= s, same, prv)
    same = pltpu.roll(x, LANES - s, 1)
    nxt = pltpu.roll(pltpu.roll(x, nrow - 1, 0), LANES - s, 1)
    return jnp.where(lane < LANES - s, same, nxt)


def _mk_kernel(stop: int, edge: int, prefix: bool):
    def _kernel(w_ref, out_ref, carry_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
            + lane
        )
        w = w_ref[:]
        # Hillis-Steele segmented OR-carry within the tile. Absorption
        # stops at a real segment boundary (stop bit) or at the tile
        # edge (EDGE, a distinct bit — carried in by the edge mask):
        # only scans that reached the EDGE without a stop belong to a
        # segment that crosses into the neighbouring tile, and only
        # those take the carry.
        s = 1
        while s < TILE:
            shifted = _flatshift(w, s, lane, reverse=prefix)
            if prefix:
                shifted = jnp.where(flat - s >= 0, shifted, edge)
            else:
                shifted = jnp.where(flat + s < TILE, shifted, edge)
            w = w | jnp.where((w & (stop | edge)) != 0, 0, shifted)
            s *= 2

        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[0] = 0

        carry = carry_ref[0]
        out = w | jnp.where((w & stop) != 0, 0, carry)
        out_ref[:] = out
        # the next grid step processes the neighbouring tile: its carry
        # is this tile's boundary scan value (fact bits only — the
        # stop/edge bits must not leak across; absorption already
        # accounted for them)
        boundary = out[ROWS - 1, LANES - 1] if prefix else out[0, 0]
        carry_ref[0] = boundary & (stop - 1)

    return _kernel


def _seg_or_xla(words, R: int, stop: int, prefix: bool):
    """XLA fallback: the same log-shift sweep over the full array
    (used off-TPU; identical results by construction)."""
    s = 1
    while s < R:
        if prefix:
            shifted = jnp.concatenate(
                [jnp.full(min(s, R), stop, jnp.int32), words[:-s]]
            )[-R:]
        else:
            shifted = jnp.concatenate(
                [words[s:], jnp.full(min(s, R), stop, jnp.int32)]
            )[:R]
        words = words | jnp.where((words & stop) != 0, 0, shifted)
        s *= 2
    return words


@functools.partial(jax.jit, static_argnames=("impl", "stop_bit", "prefix"))
def seg_scan_or(
    words: jnp.ndarray,
    impl: str = "auto",
    stop_bit: int = 1 << 6,
    prefix: bool = False,
):
    """Segmented OR-carry scan of the bits below `stop_bit`.

    words: int32[R], bits below stop_bit = facts, stop_bit = segment
    boundary (suffix direction: last row of the segment, and the
    global LAST row must carry it; prefix direction: first row of the
    segment, and the global FIRST row must carry it). Returns int32[R]
    with the segment-scan OR in the fact bits.

    impl: "auto" (Pallas on TPU, XLA sweep elsewhere), "pallas"
    (force the kernel — interpreted off-TPU, for parity tests), or
    "xla".
    """
    R = words.shape[0]
    stop = stop_bit
    # stop <= 1<<29 keeps EDGE = stop<<1 below the sign bit; no caller
    # needs more (engine.POS_STOP = 1<<29 is the largest in use)
    assert stop > 0 and (stop & (stop - 1)) == 0 and stop <= (1 << 29)
    if impl == "auto":
        on_tpu = (
            jax.default_backend() == "tpu"
            and os.environ.get("DEBWT_NO_PALLAS") != "1"
        )
        impl = "pallas" if on_tpu else "xla"
    if impl == "xla":
        return _seg_or_xla(words, R, stop, prefix)
    interpret = jax.default_backend() != "tpu"
    n_blocks = -(-R // TILE)
    pad = n_blocks * TILE - R
    # padding rows: stop set, no facts — they never contaminate, and
    # the boundary tile's carry is initialized inside the kernel.
    # For the prefix direction the padding sits at the END of the
    # array, which the left-to-right walk never propagates backwards.
    w = jnp.concatenate([words, jnp.full(pad, stop, jnp.int32)])
    w2d = w.reshape(-1, LANES)
    # EDGE is the lowest free bit above stop (stop <= 1<<29 is
    # asserted above, so EDGE never reaches the sign bit)
    edge = stop << 1
    if prefix:
        idx_map = lambda i: (i, 0)
    else:
        idx_map = lambda i: (n_blocks - 1 - i, 0)
    out = pl.pallas_call(
        _mk_kernel(stop, edge, prefix),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), idx_map)],
        out_specs=pl.BlockSpec((ROWS, LANES), idx_map),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * ROWS, LANES), jnp.int32, vma=jax.typeof(w2d).vma
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(w2d)
    return out.reshape(-1)[:R]


def seg_suffix_or(words: jnp.ndarray, impl: str = "auto"):
    """out[i] = OR of fact bits (0..5) over [i, end of i's segment].
    words: int32[R], bits 0..5 = facts, bit 6 = STOP (last row of the
    segment; the global last row MUST have it set)."""
    return seg_scan_or(words, impl=impl, stop_bit=1 << 6, prefix=False)
