"""Mesh-sharded tiled frontend == single-device tiled frontend (8 virtual
devices): the TP-analog map-tiling axis, driven end to end."""

import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.grid.tiles import TileConfig
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.frontend_tiled import run_tiled_frontend
from slam2d_tpu.run.frontend_tiled_sharded import (
    make_tile_mesh,
    run_sharded_tiled_frontend,
)


def test_sharded_tiled_frontend_matches_single_device():
    sensor = SensorConfig(n_beams=120, max_range=10.0)
    cfg = FrontendConfig(
        sensor=sensor,
        grid=GridConfig(resolution=0.1, ray_samples=100),  # params only
        matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=9),
        chunk=16,
        bootstrap_dist=2.0,
    )
    tcfg = TileConfig(tile=128, n_slots=24, resolution=0.1)

    world = SynthWorld.box_rooms(20.0)
    wp = np.array([[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5]])
    log = simulate_log(
        world, wp, sensor, step=0.15,
        odom_noise_xy=0.01, odom_noise_theta=0.004, seed=7,
    )

    _, traj_ref, _ = run_tiled_frontend(log, cfg, tcfg)

    mesh = make_tile_mesh(8)
    state, traj, scores = run_sharded_tiled_frontend(log, cfg, tcfg, mesh=mesh)

    assert np.isfinite(traj).all()
    np.testing.assert_allclose(traj, traj_ref, atol=1e-4)

    ate = ate_rmse(traj, log["gt_poses"], align=False)
    assert ate < 0.15

    # the map content really is distributed: count per-shard nonzero tiles
    tiles = np.asarray(state.tiles)
    n_local = tiles.shape[0] // 8
    shards_with_content = sum(
        1 for d in range(8)
        if np.abs(tiles[d * n_local : (d + 1) * n_local]).sum() > 0
    )
    assert shards_with_content >= 2
