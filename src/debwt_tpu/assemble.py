"""Final BWT assembly — on device.

The reference walks case-3 intervals sequentially, copying case-2 runs
from a temp file and blue chars from the sorted blue table
(insertCase3, src/insertCase3.c:13-209). With absolute coordinates
already assigned (classify.build_units), assembly is one
repeat-fill for case-2 runs + two scatters (specials, blue entries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from debwt_tpu import ops

I32 = jnp.int32


@functools.partial(jax.jit, static_argnames=("N",))
def assemble_bwt6(
    node_start, cnt, multi_in, pred,      # node table
    spec_bwtpos, spec_char6,              # specials (true order)
    blue_pos, blue_char6,                 # blue entries (ordered)
    N: int,
):
    """uint8[N] 6-letter BWT."""
    # case-2 runs: every single-in node contributes cnt copies of pred
    case2_size = jnp.where(multi_in, 0, cnt)
    fill_char = jnp.where(multi_in, jnp.uint8(0), pred)
    bwt6 = jnp.zeros(N, dtype=jnp.uint8)
    # scatter case-2 runs via repeat over (start, size)
    run_char = ops.repeat_fill(fill_char, case2_size, N)
    run_start = ops.repeat_fill(node_start, case2_size, N)
    run_off, run_seg = _run_offsets(case2_size, N)
    case2_idx = run_start + run_off
    n_case2 = jnp.sum(case2_size)
    valid = jnp.arange(N, dtype=I32) < n_case2
    bwt6 = bwt6.at[jnp.where(valid, case2_idx, N)].set(run_char, mode="drop")
    bwt6 = bwt6.at[spec_bwtpos].set(spec_char6, mode="drop")
    bwt6 = bwt6.at[blue_pos].set(blue_char6, mode="drop")
    return bwt6


def _run_offsets(sizes, total: int):
    """Within-run offsets for repeat-filled runs: [0..s0), [0..s1), ..."""
    csum = jnp.cumsum(sizes)
    idx = jnp.arange(total, dtype=I32)
    seg = jnp.searchsorted(csum, idx, side="right").astype(I32)
    starts = csum - sizes
    seg_c = jnp.minimum(seg, sizes.shape[0] - 1)
    return idx - starts[seg_c], seg


@functools.partial(jax.jit, static_argnames=("n_reads",))
def extract_sidecars(bwt6, n_reads: int):
    """(sharp_pos int32[n-1], dollar_pos int32[]) from the 6-letter BWT."""
    (sharp,) = jnp.nonzero(bwt6 == 4, size=n_reads - 1)
    (dollar,) = jnp.nonzero(bwt6 == 5, size=1)
    return sharp.astype(I32), dollar[0].astype(I32)


@jax.jit
def pack_output(bwt6):
    """uint32 words of the 2-bit output encoding (separators -> T)."""
    bwt2 = jnp.where(bwt6 >= 4, jnp.uint8(3), bwt6)
    return ops.pack_2bit_words(bwt2)
