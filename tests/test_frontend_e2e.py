"""End-to-end frontend test: synthetic world, drifting odometry, assert the
scan-matched trajectory beats raw odometry and stays under an ATE bound
(SURVEY.md §6 "Synthetic-world integration tests")."""

import numpy as np

from slam2d_tpu.config import (
    FrontendConfig,
    GridConfig,
    MatcherConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.frontend import run_frontend


def _small_cfg():
    return FrontendConfig(
        sensor=SensorConfig(n_beams=180, max_range=12.0),
        grid=GridConfig(
            height=256, width=256, resolution=0.1, ray_samples=128,
            center_x=10.0, center_y=10.0,
        ),
        matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
        chunk=16,
    )


def test_frontend_beats_odometry():
    cfg = _small_cfg()
    world = SynthWorld.box_rooms(20.0)
    wp = np.array(
        [[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5]]
    )
    log = simulate_log(
        world, wp, cfg.sensor, step=0.15,
        odom_noise_xy=0.01, odom_noise_theta=0.004, seed=7,
    )
    _, traj, scores = run_frontend(log, cfg)

    ate_slam = ate_rmse(traj, log["gt_poses"], align=False)
    ate_odom = ate_rmse(log["odom"], log["gt_poses"], align=False)
    # odometry must have drifted measurably for the test to mean anything
    assert ate_odom > 0.10
    assert ate_slam < ate_odom
    assert ate_slam < 0.10
    # matcher locks on after the map bootstraps
    assert float(np.median(scores[20:])) > 0.4
