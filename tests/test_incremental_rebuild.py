"""Incremental post-loop map rebuild (ROADMAP "map rebuild frequency"):
the cached-prefix rebuilders must be BIT-EXACT vs a from-scratch rebuild
at the same (snapped) render poses, across repeated correction rounds."""

import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.grid.tiles import TileConfig, TileTable, required_tiles, tiled_init
from slam2d_tpu.run.full_slam import (
    IncrementalRebuilder,
    make_rebuild_fn,
    snap_render_poses,
)
from slam2d_tpu.run.full_slam_tiled import (
    IncrementalTiledRebuilder,
    make_tiled_rebuild_fn,
)


def _cfg():
    return FrontendConfig(
        sensor=SensorConfig(n_beams=60, max_range=10.0),
        grid=GridConfig(height=192, width=192, resolution=0.1,
                        ray_samples=96, center_x=6.0, center_y=6.0),
        matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=9),
    )


def _keyframes(cfg, n_kf=20):
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [8.0, 3.0]])
    log = simulate_log(world, wp, cfg.sensor, step=0.2, seed=7)
    stride = max(1, len(log["odom"]) // n_kf)
    poses = np.asarray(log["gt_poses"], np.float32)[::stride][:n_kf]
    scans = np.asarray(log["ranges"], np.float32)[::stride][:n_kf]
    return poses, scans


def _pad(capacity, poses, scans):
    n = len(poses)
    pb = np.zeros((capacity, 3), np.float32)
    sb = np.zeros((capacity, scans.shape[1]), np.float32)
    mb = np.zeros(capacity, np.float32)
    pb[:n], sb[:n], mb[:n] = poses, scans, 1.0
    return jnp.asarray(pb), jnp.asarray(sb), jnp.asarray(mb)


def _perturb(poses, k0, mag, rng):
    """Loop-correction-shaped perturbation: suffix poses from k0 move by
    ~mag (cells), earlier ones by a float epsilon (must get snapped)."""
    out = poses.copy()
    out[:, :2] += rng.normal(0, 1e-5, (len(poses), 2)).astype(np.float32)
    out[k0:, :2] += rng.normal(0, mag, (len(poses) - k0, 2)).astype(np.float32)
    out[k0:, 2] += rng.normal(0, mag, len(poses) - k0).astype(np.float32)
    return out


def test_incremental_rebuild_bitexact_flat():
    cfg = _cfg()
    capacity, chunk = 32, 8
    poses, scans = _keyframes(cfg)
    inc = IncrementalRebuilder(cfg, capacity, chunk=chunk)
    full = make_rebuild_fn(cfg, capacity, chunk=chunk)
    rng = np.random.default_rng(0)

    cur = poses
    for round_i, k0 in enumerate([0, 14, 6, len(poses)]):
        if round_i:  # simulate a pose-graph correction touching k0..end
            cur = _perturb(cur, min(k0, len(cur)), 0.05, rng)
        pb, sb, mb = _pad(capacity, cur, scans)
        g_inc = inc(pb, sb, mb, n_active=len(cur))
        # oracle: from-scratch rebuild at the SNAPPED poses the rebuilder
        # actually rendered (its map_poses after the call)
        pb2 = jnp.asarray(
            np.concatenate([inc.map_poses[: len(cur)],
                            np.zeros((capacity - len(cur), 3), np.float32)])
        )
        g_ref = full(pb2, sb, mb, n_active=len(cur))
        np.testing.assert_array_equal(np.asarray(g_inc), np.asarray(g_ref))
    assert inc.cache_k > 0  # the prefix cache must actually engage


def test_snap_render_poses_prefix():
    mp = np.zeros((8, 3), np.float32)
    mp[:, 0] = np.arange(8)
    poses = mp.copy()
    poses[:, 1] += 1e-4          # sub-eps everywhere
    poses[5, 1] += 0.5           # real move at 5
    snapped, k0 = snap_render_poses(poses, 8, mp, 8, eps_xy=0.01, eps_th=0.01)
    assert k0 == 5
    np.testing.assert_array_equal(snapped[:5], mp[:5])
    assert snapped[5, 1] != mp[5, 1]


def test_incremental_rebuild_bitexact_tiled():
    cfg = _cfg()
    tcfg = TileConfig(tile=128, n_slots=16, resolution=0.1)
    capacity, chunk = 32, 8
    poses, scans = _keyframes(cfg)
    inc = IncrementalTiledRebuilder(cfg, tcfg, capacity, chunk=chunk)
    full = make_tiled_rebuild_fn(cfg, tcfg, capacity, chunk=chunk)
    rng = np.random.default_rng(1)

    table = TileTable(tcfg)
    grid = tiled_init(tcfg)
    reach = cfg.sensor.max_range + 2.0
    cur = poses
    for round_i, k0 in enumerate([0, 12, len(poses)]):
        if round_i:
            cur = _perturb(cur, min(k0, len(cur)), 0.05, rng)
        grid = table.activate(grid, required_tiles(cur[:, :2], reach, tcfg))
        pb, sb, mb = _pad(capacity, cur, scans)
        g_inc, s_inc = inc(grid.coords, pb, sb, mb, n_active=len(cur))
        pb2 = jnp.asarray(
            np.concatenate([inc.map_poses[: len(cur)],
                            np.zeros((capacity - len(cur), 3), np.float32)])
        )
        g_ref, s_ref = full(grid.coords, pb2, sb, mb, n_active=len(cur))
        np.testing.assert_array_equal(np.asarray(g_inc.tiles), np.asarray(g_ref.tiles))
        np.testing.assert_array_equal(np.asarray(s_inc.tiles), np.asarray(s_ref.tiles))
    assert inc.cache_k > 0
