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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Multi-host bring-up (SURVEY.md §3 "Multi-host").

    Wraps `jax.distributed.initialize`. With no arguments it relies on the
    cluster environment (TPU pod metadata / SLURM / OpenMPI env vars) that
    jax auto-detects; arguments override for manual two-process smoke tests:

        # terminal 1
        init_distributed("localhost:1234", 2, 0)
        # terminal 2
        init_distributed("localhost:1234", 2, 1)

    After this, `jax.devices()` spans all hosts: build the particle mesh as
    usual and shard_map's collectives ride ICI within a slice and DCN across
    slices. Data feeding stays host-local: each process feeds its own
    `jax.process_index()`-dependent shard of particles.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


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
