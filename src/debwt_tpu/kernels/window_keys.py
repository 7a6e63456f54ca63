"""Pallas TPU kernel: fused k-window 2-bit key extraction.

Computes, for every position p, the (hi, lo) uint32 pair of the
right-aligned 2-bit key of the w-char window x2p[p : p + w] — the core
primitive behind edge/node key construction (the XLA fallback in
ops.window_keys builds it from w shifted slices of the source array;
this kernel reads each source tile from HBM once and forms the keys in
VMEM with w in-register accumulate steps).

Because BlockSpec index_maps address whole blocks, the w-1 element
lookahead is supplied as a second (halo) input whose block index
points at the rows following the main tile.

STATUS: experimental, NOT wired into the engine. Correct under the
Pallas interpreter; on v5e hardware the unaligned cross-lane
`lax.slice` inside the kernel lowers incorrectly for offsets > 2
(verified against ops.window_keys), and measured perf is at parity
with the XLA fallback anyway — XLA already fuses the w shifted reads
into one HBM pass. Revisit with a sublane-rolled layout if the XLA
fallback ever shows up in profiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANES = 128
ROWS = 32          # 32 x 128 = 4096 positions per grid step
TILE = ROWS * LANES
HALO_ROWS = 8      # sublane-aligned halo: 1024 chars of lookahead


def _kernel(w: int, x_ref, halo_ref, hi_ref, lo_ref):
    flat = jnp.concatenate(
        [x_ref[:].reshape(-1), halo_ref[:].reshape(-1)]
    )
    hi = jnp.zeros((TILE,), jnp.uint32)
    lo = jnp.zeros((TILE,), jnp.uint32)
    for i in range(w):
        c = jax.lax.slice(flat, (i,), (i + TILE,))
        shift = 2 * (w - 1 - i)
        if shift >= 32:
            hi = hi | (c << (shift - 32))
        else:
            lo = lo | (c << shift)
    hi_ref[:] = hi.reshape(ROWS, LANES)
    lo_ref[:] = lo.reshape(ROWS, LANES)


@functools.partial(jax.jit, static_argnames=("w", "n_out"))
def window_keys_pallas(x2p: jnp.ndarray, w: int, n_out: int):
    """(hi, lo) uint32[n_out] window keys. x2p must have at least
    n_out + w - 1 elements; values 0..3."""
    from jax.experimental import pallas as pl

    assert w <= HALO_ROWS * LANES + 1 and ROWS % HALO_ROWS == 0
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
            jax.ShapeDtypeStruct((n_blocks * ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n_blocks * ROWS, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(x2d, x2d)
    return hi.reshape(-1)[:n_out], lo.reshape(-1)[:n_out]
