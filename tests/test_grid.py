import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import GridConfig, SensorConfig
from slam2d_tpu.grid.occupancy import (
    make_grid,
    occupancy_prob,
    raycast_update,
    world_to_cell,
)

GCFG = GridConfig(height=256, width=256, resolution=0.1, ray_samples=128)
SENSOR = SensorConfig(n_beams=16, max_range=8.0)


def test_world_to_cell_roundtrip():
    xy = jnp.asarray([[0.0, 0.0], [1.05, -2.35]], jnp.float32)
    rc = np.asarray(world_to_cell(xy, GCFG))
    # center of the grid is world (0, 0)
    assert rc[0, 0] == GCFG.height // 2 and rc[0, 1] == GCFG.width // 2
    assert rc[1, 1] == GCFG.width // 2 + 10   # +1.05m = +10.5 cells -> floor
    assert rc[1, 0] == GCFG.height // 2 - 24  # -2.35m


def test_raycast_marks_free_and_occupied():
    grid = make_grid(GCFG)
    pose = jnp.zeros(3, jnp.float32)
    # single beam along +x hitting at 3.0 m
    sensor = SensorConfig(n_beams=1, fov_rad=0.0, angle_min=0.0, max_range=8.0)
    ranges = jnp.asarray([3.0], jnp.float32)
    out = raycast_update(grid, pose, ranges, GCFG, sensor)
    p = np.asarray(occupancy_prob(out))
    r0, c0 = GCFG.height // 2, GCFG.width // 2
    # endpoint cell (3.0m -> +30 cells) occupied
    assert p[r0, c0 + 30] > 0.6
    # cells along the ray free (one update ≈ one l_free of evidence)
    assert p[r0, c0 + 5] < 0.45
    assert p[r0, c0 + 25] < 0.45
    # a second identical update strengthens the evidence
    out2 = raycast_update(out, pose, ranges, GCFG, sensor)
    p2 = np.asarray(occupancy_prob(out2))
    assert p2[r0, c0 + 5] < 0.36
    # elsewhere unknown
    assert abs(p[r0 + 50, c0] - 0.5) < 1e-6


def test_raycast_no_hit_beam_marks_only_free():
    grid = make_grid(GCFG)
    pose = jnp.zeros(3, jnp.float32)
    sensor = SensorConfig(n_beams=1, fov_rad=0.0, angle_min=0.0, max_range=8.0)
    ranges = jnp.asarray([8.0], jnp.float32)  # == max_range -> no hit
    out = raycast_update(grid, pose, ranges, GCFG, sensor)
    p = np.asarray(occupancy_prob(out))
    r0, c0 = GCFG.height // 2, GCFG.width // 2
    assert p[r0, c0 + 40] < 0.45         # free along ray
    assert p[r0, c0 + 80] <= 0.5 + 1e-6  # no occupied endpoint


def test_raycast_accumulates_and_clamps():
    grid = make_grid(GCFG)
    pose = jnp.zeros(3, jnp.float32)
    sensor = SensorConfig(n_beams=1, fov_rad=0.0, angle_min=0.0, max_range=8.0)
    ranges = jnp.asarray([3.0], jnp.float32)
    for _ in range(40):
        grid = raycast_update(grid, pose, ranges, GCFG, sensor)
    g = np.asarray(grid)
    assert g.max() <= GCFG.l_clamp + 1e-5
    assert g.min() >= -GCFG.l_clamp - 1e-5
    r0, c0 = GCFG.height // 2, GCFG.width // 2
    assert g[r0, c0 + 30] > 5.0


def test_out_of_bounds_beams_dropped():
    small = GridConfig(height=64, width=64, resolution=0.1, ray_samples=64)
    grid = make_grid(small)
    pose = jnp.asarray([2.9, 0.0, 0.0], jnp.float32)  # near +x border
    sensor = SensorConfig(n_beams=1, fov_rad=0.0, angle_min=0.0, max_range=8.0)
    out = raycast_update(grid, pose, jnp.asarray([6.0], jnp.float32), small, sensor)
    assert np.isfinite(np.asarray(out)).all()


def test_mxu_scatter_accumulation_matches_scatter():
    """One-hot-matmul accumulation == scatter-add (same samples), f32/bf16."""
    import dataclasses

    from slam2d_tpu.config import GridConfig, SensorConfig
    from slam2d_tpu.grid.occupancy import raycast_update

    cfg = GridConfig(height=96, width=96, resolution=0.1, ray_samples=64,
                     center_x=3.0, center_y=3.0)
    sensor = SensorConfig(n_beams=45, max_range=6.0)
    rng = np.random.default_rng(0)
    g = jnp.zeros((96, 96), jnp.float32)
    pose = jnp.asarray([3.0, 3.2, 0.4], jnp.float32)
    ranges = jnp.asarray(
        rng.uniform(0.5, 6.5, sensor.n_beams).astype(np.float32)
    )
    ref = raycast_update(g, pose, ranges, cfg, sensor, accumulate="scatter")
    got = raycast_update(g, pose, ranges, cfg, sensor, accumulate="mxu")
    # bf16 column one-hots are exact; the weights ride in bf16 (<=0.4% rel,
    # so a cell accumulating ~25 samples can differ by ~0.01 log-odds —
    # noise against the 0.4/0.85 increments and the +-10 clamp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)

    from slam2d_tpu.ops.mxu_update import scatter_add_mxu
    rows = jnp.asarray(rng.integers(0, 96, 500), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 96, 500), jnp.int32)
    w = jnp.asarray(rng.normal(size=500).astype(np.float32))
    exact = jnp.zeros((96, 96)).at[rows, cols].add(w)
    got32 = scatter_add_mxu(rows, cols, w, 96, 96, use_bf16=False)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(exact), atol=1e-5)
