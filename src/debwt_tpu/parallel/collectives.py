"""Shared collective building blocks for the distributed pipeline.

These are the TPU-native replacements for the reference's shared-memory
primitives: `pack_by_dest` + `all_to_all` stand in for the lock-guarded
bucket scatter (src/mySort.c:371-401), `exclusive_scan_over_devices`
for the global running counters (the `storage` coordinate,
src/INandOut.c:159-943).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32 = jnp.int32


def pack_by_dest(dest, valid, cap: int, n: int, *payload):
    """Pack rows into (n, cap) slots by destination device. Invalid
    rows and per-destination overflow are dropped; payload arrays get
    caller-chosen fill. Layout is all_to_all-ready: row d of the output
    holds the rows destined for device d, in source order."""
    outs = []
    Ns = dest.shape[0]
    order = jnp.argsort(jnp.where(valid, dest, n), stable=True)
    d_sorted = jnp.where(valid, dest, n)[order]
    idx = jnp.arange(Ns, dtype=I32)
    first = jnp.ones(Ns, dtype=bool).at[1:].set(d_sorted[1:] != d_sorted[:-1])
    seg_start = jax.lax.cummax(jnp.where(first, idx, -1))
    within = idx - seg_start
    flat = d_sorted * cap + jnp.minimum(within, cap - 1)
    ok = (d_sorted < n) & (within < cap)
    flat = jnp.where(ok, flat, n * cap)
    for arr, fill in payload:
        buf = jnp.full((n * cap,), fill, dtype=arr.dtype)
        buf = buf.at[flat].set(arr[order], mode="drop")
        outs.append(buf.reshape(n, cap))
    return outs


def a2a(x, axis: str = "d"):
    return jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=0,
                              tiled=False)


def exclusive_scan_over_devices(total, axis: str = "d"):
    """(exclusive prefix, grand total) of a per-device scalar across
    the mesh axis. Accumulates in uint32: per-shard totals are int32
    but the global prefix can reach 2^32 (the 3-4 Gbp tier)."""
    ag = jax.lax.all_gather(total, axis).astype(jnp.uint32)  # (n,)
    r = jax.lax.axis_index(axis)
    mask = jnp.arange(ag.shape[0]) < r
    return (
        jnp.sum(jnp.where(mask, ag, 0), dtype=jnp.uint32),
        jnp.sum(ag, dtype=jnp.uint32),
    )


def exclusive_scan_i32(total, axis: str = "d"):
    """int32 variant of exclusive_scan_over_devices for counters known
    to stay below 2^31 (e.g. SP-event and rank counts)."""
    ag = jax.lax.all_gather(total, axis).astype(I32)
    r = jax.lax.axis_index(axis)
    mask = jnp.arange(ag.shape[0]) < r
    return (
        jnp.sum(jnp.where(mask, ag, 0), dtype=I32),
        jnp.sum(ag, dtype=I32),
    )
