"""Device-mesh helpers (SURVEY.md §3 parallelism inventory).

The mesh + shard_map layer IS our distributed communication backend: XLA
lowers the collectives (`psum`, `all_gather`, `ppermute`) onto ICI within a
TPU slice and DCN across hosts — there is no hand-written NCCL/MPI analog.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

PARTICLE_AXIS = "particles"


def make_particle_mesh(n_devices: int | None = None, axis: str = PARTICLE_AXIS) -> Mesh:
    """1-D mesh over the particle axis (data-parallel analog).

    Uses the first `n_devices` visible devices (all by default). For
    multi-host runs, call `jax.distributed.initialize()` first; `jax.devices()`
    then spans hosts and XLA routes collectives over ICI/DCN automatically.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
