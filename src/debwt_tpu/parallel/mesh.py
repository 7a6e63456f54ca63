"""Mesh construction helpers.

The engine uses a single 1-D logical axis "d" that plays two roles at
once (the reference has no distribution at all — src/main.c is one
process; this layer is the ICI-native replacement for its pthread
fork/join patterns):

  * text-parallel: the packed text is sharded by contiguous position
    ranges with (m + pad)-wide halos — the distributed analogue of
    multiGenerateSplit's content-aligned thread splits
    (src/generateSP.c:273-341);
  * key-parallel: k-mer/node key space is sharded by leading key bits —
    the distributed analogue of mySort's 2^24-bucket scatter
    (src/mySort.c:39-110), with lax.all_to_all over ICI standing in for
    the lock-guarded shared-memory scatter.

On a multi-host v5p slice the same axis spans all chips; ICI carries
the all_to_all/all_gather traffic.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join a multi-host run via jax.distributed.

    Reads DEBWT_COORDINATOR / DEBWT_NUM_PROCESSES / DEBWT_PROCESS_ID
    when arguments are omitted (on Cloud TPU slices jax.distributed
    auto-detects all three and the env vars are unnecessary). Returns
    True if a multi-process runtime was initialized. After this,
    jax.devices() is GLOBAL across hosts and make_mesh() builds the
    whole-slice mesh; dist_build_bwt's host syncs switch to
    process_allgather automatically (dist._fetch).
    """
    coordinator = coordinator or os.environ.get("DEBWT_COORDINATOR")
    if num_processes is None:
        v = os.environ.get("DEBWT_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = os.environ.get("DEBWT_PROCESS_ID")
        process_id = int(v) if v else None
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"requested {n_devices} devices, have {len(devices)}"
                )
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("d",))
