"""Device-sharded FastSLAM driver (config 4): same host loop as
run/fastslam_run.py, but particles live sharded over the mesh and every
collective (weight psum, resampling ring) rides the interconnect."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import FrontendConfig, PFConfig
from slam2d_tpu.parallel.mesh import make_particle_mesh
from slam2d_tpu.pf.sharded import (
    make_sharded_chunk_fn,
    sharded_fastslam_init,
)


def run_sharded_fastslam(
    log: dict,
    cfg: FrontendConfig,
    pf: PFConfig,
    seed: int = 0,
    n_devices: int | None = None,
    state=None,
):
    """Returns (final_state, best_traj [T, 3], n_eff [T], best_scores [T]).

    `state`: resume from a checkpointed PFState (host or single-device
    arrays are re-placed shard-by-shard onto the mesh)."""
    from slam2d_tpu.pf.sharded import place_state

    mesh = make_particle_mesh(n_devices)
    odom = np.asarray(log["odom"], np.float32)
    ranges = np.asarray(log["ranges"], np.float32)
    T = len(odom)
    K = cfg.chunk

    if state is None:
        state = sharded_fastslam_init(
            cfg, pf, jax.random.PRNGKey(seed), mesh, start_pose=odom[0]
        )
        state = state._replace(prev_odom=jnp.asarray(odom[0]))
    else:
        state = place_state(state, mesh)
    chunk_fn = make_sharded_chunk_fn(cfg, pf, mesh)

    trajs, neffs, scores = [], [], []
    for s in range(0, T, K):
        o = odom[s : s + K]
        r = ranges[s : s + K]
        if len(o) < K:
            pad = K - len(o)
            o = np.concatenate([o, np.repeat(o[-1:], pad, axis=0)])
            r = np.concatenate([r, np.repeat(r[-1:], pad, axis=0)])
        state, (bp, ne, sc) = chunk_fn(state, jnp.asarray(o), jnp.asarray(r))
        # outputs stay on device; one device_get at the end (see
        # run/frontend.py — per-chunk fetches serialize on transfer latency)
        trajs.append(bp)
        neffs.append(ne)
        scores.append(sc)

    trajs, neffs, scores = jax.device_get((trajs, neffs, scores))
    return (
        state,
        np.concatenate(trajs)[:T],
        np.concatenate(neffs)[:T],
        np.concatenate(scores)[:T],
    )
