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

import jax
import numpy as np
from jax.sharding import Mesh


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
