import numpy as np

from slam2d_tpu.config import SensorConfig
from slam2d_tpu.data.synth import SynthWorld, default_log, simulate_log


def test_raycast_exact_distances():
    # unit box around origin; ray along +x from center hits wall at 0.5
    segs = np.array(
        [
            [-0.5, -0.5, 0.5, -0.5],
            [0.5, -0.5, 0.5, 0.5],
            [0.5, 0.5, -0.5, 0.5],
            [-0.5, 0.5, -0.5, -0.5],
        ]
    )
    w = SynthWorld(segs)
    r = w.raycast(np.zeros(3), np.array([0.0, np.pi / 2, np.pi / 4]), 10.0)
    np.testing.assert_allclose(r[0], 0.5, atol=1e-9)
    np.testing.assert_allclose(r[1], 0.5, atol=1e-9)
    np.testing.assert_allclose(r[2], 0.5 * np.sqrt(2), atol=1e-9)


def test_simulate_log_shapes_and_noise():
    sensor = SensorConfig(n_beams=36, max_range=12.0)
    world = SynthWorld.box_rooms(20.0)
    wp = np.array([[3.0, 3.0], [3.0, 8.0], [8.0, 8.0]])
    log = simulate_log(world, wp, sensor, step=0.2, seed=3)
    T = len(log["gt_poses"])
    assert log["odom"].shape == (T, 3)
    assert log["ranges"].shape == (T, 36)
    assert np.all(log["ranges"] <= sensor.max_range + 1e-6)
    # odometry drifts but starts at gt
    np.testing.assert_allclose(log["odom"][0], log["gt_poses"][0])
    drift = np.linalg.norm(log["odom"][-1, :2] - log["gt_poses"][-1, :2])
    assert drift > 0.0


def test_default_log_runs():
    world, log = default_log(step=0.5)
    assert len(log["gt_poses"]) > 50
