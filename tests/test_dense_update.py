"""Dense inverse-sensor-model update vs the sparse raycast reference."""

import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import GridConfig, SensorConfig
from slam2d_tpu.grid.occupancy import (
    make_grid,
    occupancy_prob,
    raycast_update,
    raycast_update_dense,
)

GCFG = GridConfig(height=256, width=256, resolution=0.1, ray_samples=128)
SENSOR = SensorConfig(n_beams=180, max_range=8.0)


def test_dense_marks_endpoint_and_free():
    grid = make_grid(GCFG)
    pose = jnp.zeros(3, jnp.float32)
    sensor = SensorConfig(n_beams=1, fov_rad=0.0, angle_min=0.0, max_range=8.0)
    out = raycast_update_dense(grid, pose, jnp.asarray([3.0]), GCFG, sensor)
    p = np.asarray(occupancy_prob(out))
    r0, c0 = GCFG.height // 2, GCFG.width // 2
    assert p[r0, c0 + 30] > 0.6            # endpoint occupied
    assert p[r0, c0 + 10] < 0.45           # along-ray free
    assert abs(p[r0 + 50, c0] - 0.5) < 1e-6  # out of FOV untouched


def test_dense_agrees_with_sparse_on_rays():
    """Cells ON the rays: both implementations agree in sign. Uses a real
    structured scan — with jagged random ranges the two models legitimately
    differ where one beam's ray crosses another's endpoint arc (the dense
    nearest-beam assignment is the textbook inverse sensor model)."""
    from slam2d_tpu.data.synth import SynthWorld

    world = SynthWorld.box_rooms(12.0)
    pose_np = np.array([6.3, 5.8, 0.4])
    ranges = jnp.asarray(
        world.raycast(pose_np, np.asarray(SENSOR.beam_angles()), SENSOR.max_range),
        jnp.float32,
    )
    pose = jnp.asarray(pose_np - np.array([6.0, 6.0, 0.0]), jnp.float32)
    grid = make_grid(GCFG)
    sparse = np.asarray(raycast_update(grid, pose, ranges, GCFG, SENSOR))
    dense = np.asarray(raycast_update_dense(grid, pose, ranges, GCFG, SENSOR))

    # cells the sparse version marked free are free-or-neutral in the dense
    # one (dense is deliberately more conservative near grazing walls)
    sparse_free = sparse < -0.05
    agree = (dense[sparse_free] < 1e-6).mean()
    assert agree > 0.9

    # sparse endpoint cells are predominantly occupied in the dense version
    sparse_occ = sparse > 0.5
    assert (dense[sparse_occ] > 0.5).mean() > 0.85
    # and dense almost never carves a sparse wall cell as free
    assert (dense[sparse_occ] < -0.05).mean() < 0.05

    # the dense free wedge has the same order of coverage
    assert (dense < -0.05).sum() > 0.8 * sparse_free.sum()


def test_dense_no_hit_beam_only_free():
    grid = make_grid(GCFG)
    pose = jnp.zeros(3, jnp.float32)
    sensor = SensorConfig(n_beams=1, fov_rad=0.0, angle_min=0.0, max_range=8.0)
    out = raycast_update_dense(
        grid, pose, jnp.asarray([8.0]), GCFG, sensor
    )
    assert float(out.max()) <= 1e-6  # nothing occupied


def test_dense_enable_gate():
    grid = make_grid(GCFG)
    pose = jnp.zeros(3, jnp.float32)
    ranges = jnp.full((SENSOR.n_beams,), 4.0, jnp.float32)
    out = raycast_update_dense(grid, pose, ranges, GCFG, SENSOR, enable=0.0)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_dense_window_origin():
    grid = jnp.zeros((64, 64), jnp.float32)
    pose = jnp.asarray([5.0, 5.0, 0.0], jnp.float32)
    sensor = SensorConfig(n_beams=1, fov_rad=0.0, angle_min=0.0, max_range=8.0)
    # window whose cell (0, 0) sits at world (2.0, 2.0)
    out = raycast_update_dense(
        grid, pose, jnp.asarray([2.0]), GCFG, sensor, origin_xy=(2.0, 2.0)
    )
    p = np.asarray(occupancy_prob(out))
    # endpoint at world (7.0, 5.0) -> cell (row 30, col 50)
    assert p[30, 50] > 0.6
    assert p[30, 40] < 0.45
