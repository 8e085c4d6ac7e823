"""ATE parity: our frontend vs the NumPy reference-style comparator on the
same synthetic log (SURVEY.md §6 "Parity tests vs reference behavior")."""

import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.frontend import run_frontend

from tests.numpy_reference import NumpyRefSLAM


def test_frontend_ate_parity_with_numpy_reference():
    sensor = SensorConfig(n_beams=120, max_range=12.0)
    cfg = FrontendConfig(
        sensor=sensor,
        grid=GridConfig(
            height=256, width=256, resolution=0.1, ray_samples=128,
            center_x=10.0, center_y=10.0,
        ),
        matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
        chunk=16,
    )
    world = SynthWorld.box_rooms(20.0)
    wp = np.array([[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5]])
    log = simulate_log(
        world, wp, sensor, step=0.15,
        odom_noise_xy=0.015, odom_noise_theta=0.006, seed=13,
    )

    _, traj_tpu, _ = run_frontend(log, cfg)
    ref = NumpyRefSLAM(n_beams=sensor.n_beams)
    traj_ref = ref.run(log, bootstrap=20)

    gt = log["gt_poses"]
    ate_tpu = ate_rmse(traj_tpu, gt, align=False)
    ate_ref = ate_rmse(traj_ref, gt, align=False)
    ate_odom = ate_rmse(log["odom"], gt, align=False)

    # the comparator must be functional (improves on or tracks odometry)
    assert ate_ref < max(2.0 * ate_odom, 1.0)
    # parity: our trajectory is at least as good as the reference-style one
    assert ate_tpu <= ate_ref * 1.1
