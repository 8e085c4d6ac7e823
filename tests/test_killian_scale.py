"""MIT-Killian-scale scenario (SURVEY.md config 5): a ~230 m corridor loop
on the unbounded tiled map — odometry drifts ~10 m, the big loop closure
pulls the keyframe trajectory back to sub-meter ATE."""

import numpy as np

from slam2d_tpu.config import (
    FrontendConfig,
    GraphConfig,
    GridConfig,
    MatcherConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import corridor_loop_log
from slam2d_tpu.grid.tiles import TileConfig
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.full_slam_tiled import run_full_slam_tiled


def test_killian_scale_loop_closure():
    sensor = SensorConfig(n_beams=180, max_range=12.0)
    cfg = FrontendConfig(
        sensor=sensor,
        grid=GridConfig(resolution=0.1, ray_samples=128),
        matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
        chunk=32,
        bootstrap_dist=2.0,
    )
    tcfg = TileConfig(tile=256, n_slots=48, resolution=0.1)
    gcfg = GraphConfig(
        max_nodes=512, max_edges=2048, keyframe_dist=1.0,
        loop_min_gap=20, loop_radius=3.0, loop_score_accept=0.35,
        gn_iters=10,
    )
    world, log = corridor_loop_log(
        sensor, span=60.0, step=0.25,
        odom_noise_xy=0.02, odom_noise_theta=0.004, seed=3,
    )
    assert len(log["odom"]) > 800  # ~230 m of travel

    res = run_full_slam_tiled(log, cfg, tcfg, gcfg)

    gt = log["gt_poses"]
    ate_odom = ate_rmse(log["odom"], gt, align=False)
    ate_kf = ate_rmse(res.kf_poses, gt[res.kf_scan_idx], align=False)

    assert ate_odom > 5.0            # the scenario is genuinely hard
    assert res.n_loops >= 1          # the lap closure fired
    assert ate_kf < 2.0              # sub-1% of path length
    assert ate_kf < ate_odom / 5.0
    # the emitted per-scan trajectory is retro-corrected too
    ate_traj = ate_rmse(res.traj, gt, align=False)
    assert ate_traj < ate_odom / 3.0
    # the world spanned multiple tiles
    coords = np.asarray(res.grid.coords[:-1])
    assert (coords[:, 0] > -(2**30)).sum() >= 6
