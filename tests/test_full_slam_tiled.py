"""Unbounded-world full SLAM (tiled frontend + loop closure + pose graph)."""

import numpy as np
import pytest

from slam2d_tpu.config import (
    FrontendConfig,
    GraphConfig,
    GridConfig,
    MatcherConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.grid.tiles import TileConfig
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.full_slam_tiled import run_full_slam_tiled


@pytest.mark.parametrize("optimizer", ["dense", "schur"])
def test_tiled_full_slam_closes_loops(optimizer):
    sensor = SensorConfig(n_beams=120, max_range=12.0)
    cfg = FrontendConfig(
        sensor=sensor,
        grid=GridConfig(resolution=0.1, ray_samples=128),  # kernel params
        matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
        chunk=16,
        bootstrap_dist=2.0,
    )
    tcfg = TileConfig(tile=128, n_slots=32, resolution=0.1)
    gcfg = GraphConfig(
        max_nodes=128, max_edges=512, keyframe_dist=0.5,
        loop_min_gap=10, loop_radius=2.5, loop_score_accept=0.35,
        gn_iters=10,
    )
    world = SynthWorld.box_rooms(20.0)
    wp = np.array(
        [[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5],
         [17.0, 9.0], [12.0, 14.0], [9.0, 17.0], [4.0, 16.0], [3.0, 10.0],
         [3.0, 3.8]]
    )
    log = simulate_log(
        world, wp, sensor, step=0.15,
        odom_noise_xy=0.02, odom_noise_theta=0.008, seed=5,
    )
    res = run_full_slam_tiled(log, cfg, tcfg, gcfg, optimizer=optimizer)

    assert len(res.kf_poses) > 20
    assert np.isfinite(res.traj).all()
    assert res.n_loops >= 1

    idx = res.kf_scan_idx
    gt_kf = log["gt_poses"][idx]
    ate_kf = ate_rmse(res.kf_poses, gt_kf, align=False)
    ate_odom = ate_rmse(log["odom"][idx], gt_kf, align=False)
    assert ate_odom > 0.2
    assert ate_kf < ate_odom
    assert ate_kf < 0.35
