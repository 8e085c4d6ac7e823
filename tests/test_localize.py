"""Localization-only mode: pose tracking against a FIXED prebuilt map
(run/frontend.py run_localization; SURVEY.md L5 driver surface)."""

import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld, simulate_log, splice_odom
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.frontend import run_frontend, run_localization

CFG = FrontendConfig(
    sensor=SensorConfig(n_beams=120, max_range=10.0),
    grid=GridConfig(height=256, width=256, resolution=0.1, ray_samples=128,
                    center_x=10.0, center_y=10.0),
    matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
    chunk=16,
)


def _logs():
    world = SynthWorld.box_rooms(20.0)
    wp = np.array([[3, 3], [3, 8], [8, 8], [12, 3.5], [16, 3.5]], float)
    map_log = simulate_log(world, wp, CFG.sensor, step=0.15,
                           odom_noise_xy=0.005, odom_noise_theta=0.002, seed=1)
    # second traversal of the same space, noisier odometry
    loc_log = simulate_log(world, wp[::-1].copy(), CFG.sensor, step=0.15,
                           odom_noise_xy=0.04, odom_noise_theta=0.015, seed=9)
    return map_log, loc_log


def test_localization_beats_odometry_and_map_is_fixed():
    map_log, loc_log = _logs()
    state, _, _ = run_frontend(map_log, CFG)
    prebuilt = np.asarray(state.logodds)

    st, traj, scores, events = run_localization(loc_log, CFG, prebuilt)
    gt = loc_log["gt_poses"]
    ate = float(ate_rmse(traj, gt, align=False))
    odom_ate = float(ate_rmse(loc_log["odom"], gt, align=False))
    assert ate < odom_ate
    assert ate < 0.25, ate
    # the map must be bit-identical afterwards: localization never writes
    np.testing.assert_array_equal(np.asarray(st.logodds), prebuilt)


def test_localization_from_ros_map(tmp_path):
    import dataclasses

    from slam2d_tpu.viz.ros_map import load_ros_map, save_ros_map

    map_log, loc_log = _logs()
    state, _, _ = run_frontend(map_log, CFG)
    save_ros_map(str(tmp_path / "map"), state.logodds, CFG.grid)
    prebuilt, gcfg = load_ros_map(str(tmp_path / "map.yaml"))
    cfg = dataclasses.replace(CFG, grid=gcfg)

    _, traj, _, _ = run_localization(loc_log, cfg, prebuilt)
    gt = loc_log["gt_poses"]
    ate = float(ate_rmse(traj, gt, align=False))
    odom_ate = float(ate_rmse(loc_log["odom"], gt, align=False))
    assert ate < odom_ate, (ate, odom_ate)




def test_recovery_after_kidnap():
    """Odometry that silently lies about a teleport (two traversals spliced
    with a continuous odom frame) collapses the match scores; recovery
    relocalizes on the whole map and tracking resumes near ground truth."""
    world = SynthWorld.box_rooms(20.0)
    map_log = simulate_log(
        world,
        np.array([[3, 3], [3, 8], [8, 8], [12, 3.5], [16, 3.5],
                  [17, 9], [12, 14], [9, 17], [4, 16]], float),
        CFG.sensor, step=0.15, odom_noise_xy=0.005, odom_noise_theta=0.002,
        seed=1,
    )
    state, _, _ = run_frontend(map_log, CFG)
    prebuilt = np.asarray(state.logodds)

    a = simulate_log(world, np.array([[3, 3], [3, 8], [7, 8]], float),
                     CFG.sensor, step=0.15, seed=3)
    b = simulate_log(world, np.array([[16, 3.5], [16.5, 8.5], [12.5, 13.5]], float),
                     CFG.sensor, step=0.15, seed=4)
    # splice: gt teleports, but odometry continues smoothly (the lie)
    Ta = len(a["odom"])
    log = {
        "odom": np.concatenate([a["odom"], splice_odom(a["odom"], b["odom"])]),
        "ranges": np.concatenate([a["ranges"], b["ranges"]]),
        "gt_poses": np.concatenate([a["gt_poses"], b["gt_poses"]]),
    }

    _, traj, scores, events = run_localization(
        log, CFG, prebuilt, recover=True,
    )
    assert len(events) >= 1, "recovery never fired"
    # after the last recovery, tracking must be back near ground truth
    k0 = events[-1]["scan"] + 1
    tail_err = np.hypot(
        traj[k0:, 0] - log["gt_poses"][k0:, 0],
        traj[k0:, 1] - log["gt_poses"][k0:, 1],
    )
    assert np.median(tail_err) < 0.5, float(np.median(tail_err))
