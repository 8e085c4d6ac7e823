"""FastSLAM driver (SURVEY.md §5.2, config 3): host streams chunks, device
runs `lax.scan` over jitted vmapped particle steps."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import FrontendConfig, PFConfig
from slam2d_tpu.pf.fastslam import PFState, fastslam_init, fastslam_step


@functools.cache
def make_pf_chunk_fn(cfg: FrontendConfig, pf: PFConfig):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk_fn(state: PFState, odom_chunk, ranges_chunk):
        def body(s, inp):
            o, r = inp
            s2, out = fastslam_step(s, o, r, cfg, pf)
            return s2, out

        state, outs = jax.lax.scan(body, state, (odom_chunk, ranges_chunk))
        return state, outs

    return chunk_fn


def run_fastslam(
    log: dict,
    cfg: FrontendConfig,
    pf: PFConfig,
    seed: int = 0,
    state: PFState | None = None,
    frame_cb=None,
):
    """Returns (final_state, best_traj [T, 3], n_eff [T], best_scores [T]).

    `frame_cb(logodds, traj_chunk)` captures the BEST particle's map at
    each chunk boundary for animation export (fetches one [H, W] map per
    chunk — leave None on throughput runs)."""
    odom = np.asarray(log["odom"], np.float32)
    ranges = np.asarray(log["ranges"], np.float32)
    T = len(odom)
    K = cfg.chunk

    if state is None:
        state = fastslam_init(
            cfg, pf, jax.random.PRNGKey(seed), start_pose=odom[0]
        )
        state = state._replace(prev_odom=jnp.asarray(odom[0]))
    chunk_fn = make_pf_chunk_fn(cfg, pf)

    trajs, neffs, scores = [], [], []
    for s in range(0, T, K):
        o = odom[s : s + K]
        r = ranges[s : s + K]
        n_here = len(o)
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
        if frame_cb is not None:
            best_map = jnp.take(
                state.logodds, jnp.argmax(state.log_w), axis=0
            )
            frame_cb(best_map, np.asarray(bp)[:n_here])

    trajs, neffs, scores = jax.device_get((trajs, neffs, scores))
    return (
        state,
        np.concatenate(trajs)[:T],
        np.concatenate(neffs)[:T],
        np.concatenate(scores)[:T],
    )
