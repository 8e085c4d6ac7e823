"""Global relocalization (match/global_loc.py): recover the pose of a
scan anywhere in a prebuilt map with no prior."""

import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.match.global_loc import global_localize
from slam2d_tpu.run.frontend import run_frontend

CFG = FrontendConfig(
    sensor=SensorConfig(n_beams=120, max_range=10.0),
    grid=GridConfig(height=256, width=256, resolution=0.1, ray_samples=128,
                    center_x=10.0, center_y=10.0),
    matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
    chunk=16,
)


def _build_map():
    world = SynthWorld.box_rooms(20.0)
    wp = np.array([[3, 3], [3, 8], [8, 8], [12, 3.5], [16, 3.5]], float)
    log = simulate_log(world, wp, CFG.sensor, step=0.15,
                       odom_noise_xy=0.005, odom_noise_theta=0.002, seed=1)
    state, _, _ = run_frontend(log, CFG)
    return world, state.logodds


def test_global_localize_recovers_arbitrary_poses():
    world, logodds = _build_map()
    beams = np.asarray(CFG.sensor.beam_angles())
    # kidnapped-robot poses scattered over the mapped area, arbitrary headings
    poses = np.array([
        [4.0, 5.0, 0.7],
        [9.0, 7.5, -2.2],
        [14.0, 4.0, 2.9],
    ], np.float32)
    for true in poses:
        ranges = world.raycast(true, beams, CFG.sensor.max_range)
        est, score = global_localize(
            logodds, np.asarray(ranges, np.float32),
            CFG.grid, CFG.matcher, CFG.sensor,
        )
        est = np.asarray(est)
        err_xy = np.hypot(est[0] - true[0], est[1] - true[1])
        err_th = abs((est[2] - true[2] + np.pi) % (2 * np.pi) - np.pi)
        assert err_xy < 0.15, (true, est, err_xy)
        assert err_th < 0.1, (true, est, err_th)
        assert float(score) > 0.4


def test_global_peak_without_refine_is_cell_grade():
    # NOTE: the pose must lie in WELL-MAPPED territory — a scan taken in a
    # barely-observed region legitimately matches a better-mapped look-alike
    # room instead (score tells: ~0.16 at such a pose vs ~0.7 at the alias)
    world, logodds = _build_map()
    beams = np.asarray(CFG.sensor.beam_angles())
    true = np.array([9.0, 7.0, 1.3], np.float32)
    ranges = world.raycast(true, beams, CFG.sensor.max_range)
    est, score = global_localize(
        logodds, np.asarray(ranges, np.float32),
        CFG.grid, CFG.matcher, CFG.sensor, refine=False,
    )
    est = np.asarray(est)
    assert np.hypot(est[0] - true[0], est[1] - true[1]) < 0.25
    th = 2 * np.pi / 72
    err_th = abs((est[2] - true[2] + np.pi) % (2 * np.pi) - np.pi)
    assert err_th < th
