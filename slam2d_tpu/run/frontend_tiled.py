"""Frontend on the tiled, unbounded world map (SURVEY.md §2 L1 + §9 step 2).

Same per-scan step as run/frontend.py (gated correlative match + gated
raycast update, cached blurred field), but the backing store is the tile
pool of grid/tiles.py: the hot path still sees a static [win, win] window —
gathered from / scattered to up to 4 tiles — while the HOST activates tiles
ahead of the robot from the odometry forecast. The trajectory is therefore
unbounded by any fixed grid extent; capacity is the tile-pool size.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.core import se2
from slam2d_tpu.grid.occupancy import integrate_scan
from slam2d_tpu.grid.tiles import (
    TileConfig,
    TiledGrid,
    TileTable,
    gather_region,
    required_tiles,
    scatter_region,
    tiled_init,
    world_to_cell_global,
)
from slam2d_tpu.grid.window import blur_halo_cells
from slam2d_tpu.match.correlative import build_search_space, match_scan


def tiled_window_cells(tcfg: TileConfig, sensor: SensorConfig, mcfg: MatcherConfig) -> int:
    half = (
        int(math.ceil(sensor.max_range / tcfg.resolution))
        + int(round(mcfg.search_xy / tcfg.resolution))
        + blur_halo_cells(mcfg, tcfg.resolution)
        + 8
    )
    mult = 8 * mcfg.coarse_factor
    return ((2 * half + mult - 1) // mult) * mult


class TiledFrontendState(NamedTuple):
    grid: TiledGrid          # log-odds tiles
    sgrid: TiledGrid         # cached blurred-field tiles (same table/coords)
    pose: jax.Array
    prev_odom: jax.Array
    dist: jax.Array
    last_map_pose: jax.Array
    since_match: jax.Array


def tiled_frontend_init(tcfg: TileConfig, start_pose=None, start_odom=None):
    pose = (
        jnp.zeros(3, jnp.float32)
        if start_pose is None
        else jnp.asarray(start_pose, jnp.float32)
    )
    odom = pose if start_odom is None else jnp.asarray(start_odom, jnp.float32)
    return TiledFrontendState(
        grid=tiled_init(tcfg),
        sgrid=tiled_init(tcfg),
        pose=pose,
        prev_odom=odom + 0.0,
        dist=jnp.float32(0.0),
        last_map_pose=pose + 0.0,
        since_match=jnp.zeros(2, jnp.float32),
    )


def _param_grid_cfg(cfg: FrontendConfig, tcfg: TileConfig) -> GridConfig:
    """GridConfig carrying only the parameters the kernels read (resolution,
    log-odds constants, ray sampling); shape/origin come from the window."""
    import dataclasses

    return dataclasses.replace(cfg.grid, resolution=tcfg.resolution)


def tiled_frontend_step(
    state: TiledFrontendState, odom, ranges,
    cfg: FrontendConfig, tcfg: TileConfig,
):
    win = tiled_window_cells(tcfg, cfg.sensor, cfg.matcher)
    halo = blur_halo_cells(cfg.matcher, tcfg.resolution)
    gparam = _param_grid_cfg(cfg, tcfg)

    delta = se2.between(state.prev_odom, odom)
    step_len = jnp.hypot(delta[0], delta[1])
    prior = se2.compose(state.pose, delta)
    in_boot = state.dist < cfg.bootstrap_dist
    since_m = state.since_match + jnp.stack(
        [step_len, jnp.abs(se2.wrap_angle(delta[2]))]
    )
    do_match = (~in_boot) & (
        (since_m[0] >= cfg.match_min_motion) | (since_m[1] >= cfg.match_min_rot)
    )

    def window_origin_rc(center_xy):
        rc = world_to_cell_global(center_xy, tcfg)
        return rc - win // 2

    def origin_xy_of(origin_rc):
        return (
            tcfg.origin_x + origin_rc[1].astype(jnp.float32) * tcfg.resolution,
            tcfg.origin_y + origin_rc[0].astype(jnp.float32) * tcfg.resolution,
        )

    def match_branch(_):
        orc = window_origin_rc(prior[:2])
        Sw = gather_region(state.sgrid, tcfg, orc, win)
        return match_scan(
            None, ranges, prior, gparam, cfg.matcher, cfg.sensor,
            search_space=Sw, origin_xy=origin_xy_of(orc),
        )

    def skip_match(_):
        return prior, jnp.float32(-1.0)

    pose, score = jax.lax.cond(do_match, match_branch, skip_match, None)
    since_m = jnp.where(do_match, jnp.zeros_like(since_m), since_m)

    moved = jnp.hypot(
        pose[0] - state.last_map_pose[0], pose[1] - state.last_map_pose[1]
    )
    rotated = jnp.abs(se2.wrap_angle(pose[2] - state.last_map_pose[2]))
    do_update = in_boot | (moved >= cfg.map_update_min_motion) | (
        rotated >= cfg.map_update_min_rot
    )

    def update_branch(_):
        orc = window_origin_rc(pose[:2])
        gw = gather_region(state.grid, tcfg, orc, win)
        gw = integrate_scan(
            gw, pose, ranges, gparam, cfg.sensor, origin_xy=origin_xy_of(orc)
        )
        grid = scatter_region(state.grid, tcfg, gw, orc)
        Sw = build_search_space(gw, cfg.matcher, tcfg.resolution)
        sgrid = scatter_region(
            state.sgrid, tcfg, Sw[halo:-halo, halo:-halo], orc + halo
        )
        return grid, sgrid

    def skip_update(_):
        return state.grid, state.sgrid

    grid, sgrid = jax.lax.cond(do_update, update_branch, skip_update, None)
    last_map_pose = jnp.where(do_update, pose, state.last_map_pose)
    return (
        TiledFrontendState(
            grid, sgrid, pose, odom, state.dist + step_len,
            last_map_pose, since_m,
        ),
        (pose, score),
    )


@functools.cache
def make_tiled_chunk_fn(cfg: FrontendConfig, tcfg: TileConfig):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk_fn(state, odom_chunk, ranges_chunk):
        def body(s, inp):
            o, r = inp
            return tiled_frontend_step(s, o, r, cfg, tcfg)

        state, (traj, scores) = jax.lax.scan(
            body, state, (odom_chunk, ranges_chunk)
        )
        return state, traj, scores

    return chunk_fn


def run_tiled_frontend(
    log: dict, cfg: FrontendConfig, tcfg: TileConfig,
    state: TiledFrontendState | None = None,
    drift_margin: float = 2.0,
):
    """Host loop: activate tiles ahead of the odometry forecast, run chunks."""
    odom = np.asarray(log["odom"], np.float32)
    ranges = np.asarray(log["ranges"], np.float32)
    T = len(odom)
    K = cfg.chunk

    if state is None:
        state = tiled_frontend_init(tcfg, start_pose=odom[0], start_odom=odom[0])
    table = TileTable(tcfg)
    chunk_fn = make_tiled_chunk_fn(cfg, tcfg)
    reach = (
        cfg.sensor.max_range + cfg.matcher.search_xy
        + blur_halo_cells(cfg.matcher, tcfg.resolution) * tcfg.resolution
        + drift_margin
    )

    trajs, scores = [], []
    # carried host copies of (pose, prev_odom) — see run_full_slam_tiled:
    # the forecast re-fetched both from the device every chunk; the pose
    # now piggybacks on the trajectory fetch and prev_odom is the last
    # odometry record the host fed in
    est = np.asarray(state.pose)
    base = np.asarray(state.prev_odom)
    for s in range(0, T, K):
        o = odom[s : s + K]
        r = ranges[s : s + K]
        if len(o) < K:
            pad = K - len(o)
            o = np.concatenate([o, np.repeat(o[-1:], pad, axis=0)])
            r = np.concatenate([r, np.repeat(r[-1:], pad, axis=0)])

        # forecast: current estimate composed with the chunk's odom deltas
        fx = []
        for t in range(len(o)):
            d = _np_between(base, o[t])
            fx.append(_np_compose(est, d)[:2])
        need = required_tiles(np.asarray(fx), reach, tcfg)
        grid = table.activate(state.grid, need)
        # distinct buffer for the twin table — the chunk donates the state
        sgrid = state.sgrid._replace(coords=grid.coords + 0)
        state = state._replace(grid=grid, sgrid=sgrid)

        state, tr, sc = chunk_fn(state, jnp.asarray(o), jnp.asarray(r))
        tr, sc, est = jax.device_get((tr, sc, state.pose))
        base = o[-1]
        trajs.append(tr)
        scores.append(sc)

    return state, np.concatenate(trajs)[:T], np.concatenate(scores)[:T]


def _np_between(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    return np.array(
        [c * dx + s * dy, -s * dx + c * dy,
         (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi]
    )


def _np_between_batch(a, B):
    """_np_between(a, b) for every row b of B [N, 3] -> [N, 3]."""
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = B[:, 0] - a[0], B[:, 1] - a[1]
    return np.stack(
        [c * dx + s * dy, -s * dx + c * dy,
         (B[:, 2] - a[2] + np.pi) % (2 * np.pi) - np.pi],
        axis=1,
    ).astype(np.float32)


def _np_compose(a, d):
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array(
        [a[0] + c * d[0] - s * d[1], a[1] + s * d[0] + c * d[1],
         (a[2] + d[2] + np.pi) % (2 * np.pi) - np.pi]
    )


def _np_compose_batch(a, D):
    """_np_compose(a, d) for every row d of D [N, 3] -> [N, 3]."""
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.stack(
        [a[0] + c * D[:, 0] - s * D[:, 1],
         a[1] + s * D[:, 0] + c * D[:, 1],
         (a[2] + D[:, 2] + np.pi) % (2 * np.pi) - np.pi],
        axis=1,
    ).astype(np.float32)


def _np_inverse(a):
    """SE(2) inverse: _np_compose(a, _np_inverse(a)) == identity."""
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array([-(c * a[0] + s * a[1]), s * a[0] - c * a[1], -a[2]])
