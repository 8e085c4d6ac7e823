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
    host_gated: bool | None = None,
):
    """Returns (final_state, best_traj [T, 3], n_eff [T], best_scores [T]).

    `state`: resume from a checkpointed PFState (host or single-device
    arrays are re-placed shard-by-shard onto the mesh).

    `host_gated`: as in run_fastslam — stage-specialized sharded programs
    dispatched per the host's odometry-derived gates (no map-shaped cond
    joins; the gates are replicated scalars, identical on every shard),
    vs the single-program lax.cond chunk form. Default (None): gated iff
    n_particles >= pf.host_gate_min_particles."""
    from slam2d_tpu.pf.sharded import (
        make_sharded_heavy_step,
        make_sharded_light_chunk,
        place_state,
    )

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

    if host_gated is None:
        host_gated = pf.n_particles >= pf.host_gate_min_particles
    if host_gated:
        from slam2d_tpu.run.fastslam_run import _run_fastslam_host_gated

        return _run_fastslam_host_gated(
            odom, ranges, cfg, pf, state, None,
            heavy_factory=lambda r, u, b: make_sharded_heavy_step(
                cfg, pf, mesh, r, u, b
            ),
            light_factory=lambda n: make_sharded_light_chunk(
                cfg, pf, mesh, n
            ),
        )
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
