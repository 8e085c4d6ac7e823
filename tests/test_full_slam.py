import numpy as np

from slam2d_tpu.config import (
    FrontendConfig,
    GraphConfig,
    GridConfig,
    MatcherConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.full_slam import run_full_slam


def _cfg():
    return FrontendConfig(
        sensor=SensorConfig(n_beams=120, max_range=12.0),
        grid=GridConfig(
            height=256, width=256, resolution=0.1, ray_samples=128,
            center_x=10.0, center_y=10.0,
        ),
        matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
        chunk=16,
        bootstrap_dist=2.0,
    )


def test_full_slam_closes_loops_and_improves_keyframes():
    cfg = _cfg()
    gcfg = GraphConfig(
        max_nodes=128, max_edges=512, keyframe_dist=0.5,
        loop_min_gap=10, loop_radius=2.5, loop_score_accept=0.35,
        gn_iters=10,
    )
    world = SynthWorld.box_rooms(20.0)
    # loopy square-ish trajectory returning to the start
    wp = np.array(
        [[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5],
         [17.0, 9.0], [12.0, 14.0], [9.0, 17.0], [4.0, 16.0], [3.0, 10.0],
         [3.0, 3.8]]
    )
    log = simulate_log(
        world, wp, cfg.sensor, step=0.15,
        odom_noise_xy=0.02, odom_noise_theta=0.008, seed=5,
    )
    res = run_full_slam(log, cfg, gcfg)

    assert len(res.kf_poses) > 20
    assert np.isfinite(res.traj).all()
    assert res.n_loops >= 1

    # keyframe trajectory ATE must improve on raw odometry at keyframes
    idx = res.kf_scan_idx
    gt_kf = log["gt_poses"][idx]
    odom_kf = log["odom"][idx]
    ate_kf = ate_rmse(res.kf_poses, gt_kf, align=False)
    ate_odom = ate_rmse(odom_kf, gt_kf, align=False)
    assert ate_odom > 0.2  # the scenario must be hard enough to matter
    assert ate_kf < ate_odom
    assert ate_kf < 0.35


def test_full_slam_schur_sharded_optimizer():
    """Driver wiring for optimizer="schur_sharded" (8 virtual devices):
    same loops and keyframe accuracy as the dense run."""
    cfg = _cfg()
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
        world, wp, cfg.sensor, step=0.15,
        odom_noise_xy=0.02, odom_noise_theta=0.008, seed=5,
    )
    res = run_full_slam(log, cfg, gcfg, optimizer="schur_sharded")
    assert res.n_loops >= 1
    idx = res.kf_scan_idx
    gt_kf = log["gt_poses"][idx]
    ate_kf = ate_rmse(res.kf_poses, gt_kf, align=False)
    ate_odom = ate_rmse(log["odom"][idx], gt_kf, align=False)
    assert ate_kf < ate_odom
    assert ate_kf < 0.35


def test_full_slam_hier_optimizer():
    """Driver wiring for optimizer="hier" (the hierarchical matrix-free
    backend, graph/sparse.py): same loopy scenario as the dense test,
    must close loops and land comparable keyframe accuracy."""
    cfg = _cfg()
    gcfg = GraphConfig(
        max_nodes=128, max_edges=512, keyframe_dist=0.5,
        loop_min_gap=10, loop_radius=2.5, loop_score_accept=0.35,
        gn_iters=10, sparse_max_loops=16, sparse_coarse_stride=8,
    )
    world = SynthWorld.box_rooms(20.0)
    wp = np.array(
        [[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5],
         [17.0, 9.0], [12.0, 14.0], [9.0, 17.0], [4.0, 16.0], [3.0, 10.0],
         [3.0, 3.8]]
    )
    log = simulate_log(
        world, wp, cfg.sensor, step=0.15,
        odom_noise_xy=0.02, odom_noise_theta=0.008, seed=5,
    )
    res = run_full_slam(log, cfg, gcfg, optimizer="hier")
    assert res.n_loops >= 1
    idx = res.kf_scan_idx
    gt_kf = log["gt_poses"][idx]
    ate_kf = ate_rmse(res.kf_poses, gt_kf, align=False)
    ate_odom = ate_rmse(log["odom"][idx], gt_kf, align=False)
    assert ate_kf < ate_odom
    assert ate_kf < 0.4
