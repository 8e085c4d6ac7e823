"""Tiled-world frontend: tracks a trajectory that would overflow any single
fixed grid of the same tile size, activating tiles on the fly."""

import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.grid.tiles import TileConfig
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.frontend_tiled import run_tiled_frontend


def test_tiled_frontend_tracks():
    sensor = SensorConfig(n_beams=120, max_range=10.0)
    cfg = FrontendConfig(
        sensor=sensor,
        grid=GridConfig(resolution=0.1, ray_samples=100),  # params only
        matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=9),
        chunk=16,
        bootstrap_dist=2.0,
    )
    # tiles of 12.8 m; the 20 m world needs a 2x2+ neighborhood
    tcfg = TileConfig(tile=128, n_slots=24, resolution=0.1)

    world = SynthWorld.box_rooms(20.0)
    wp = np.array([[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5]])
    log = simulate_log(
        world, wp, sensor, step=0.15,
        odom_noise_xy=0.01, odom_noise_theta=0.004, seed=7,
    )
    state, traj, scores = run_tiled_frontend(log, cfg, tcfg)

    assert np.isfinite(traj).all()
    ate = ate_rmse(traj, log["gt_poses"], align=False)
    ate_odom = ate_rmse(log["odom"], log["gt_poses"], align=False)
    assert ate < ate_odom
    assert ate < 0.15
    # several tiles actually activated
    coords = np.asarray(state.grid.coords)
    active = (coords[:-1, 0] > -(2**30)).sum()
    assert active >= 4
