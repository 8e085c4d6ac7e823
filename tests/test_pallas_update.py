"""Pallas dense-update kernel vs the XLA dense update (interpret on CPU)."""

import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import GridConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld
from slam2d_tpu.grid.occupancy import make_grid, raycast_update_dense
from slam2d_tpu.ops.pallas_update import pallas_dense_update

GCFG = GridConfig(height=256, width=256, resolution=0.1)
SENSOR = SensorConfig(n_beams=90, max_range=8.0)


def _scan():
    world = SynthWorld.box_rooms(12.0)
    pose_np = np.array([6.3, 5.8, 0.4])
    r = world.raycast(
        pose_np, np.asarray(SENSOR.beam_angles()), SENSOR.max_range
    )
    # pose relative to the grid center (grid center is world (0, 0))
    return jnp.asarray([0.3, -0.2, 0.4], jnp.float32), jnp.asarray(r, jnp.float32)


def test_pallas_update_matches_dense_semantics():
    pose, ranges = _scan()
    grid = make_grid(GCFG)
    a = np.asarray(raycast_update_dense(grid, pose, ranges, GCFG, SENSOR))
    b = np.asarray(
        pallas_dense_update(grid, pose, ranges, GCFG, SENSOR, interpret=True)
    )
    # occupied: kernel is a superset (checks all beams within cross-track,
    # not just the two nearest) that still contains every XLA mark
    assert ((a > 0.5) & ~(b > 0.5)).sum() == 0
    assert (b > 0.5).sum() <= (a > 0.5).sum() * 1.2
    # free: kernel is conservative (3-neighborhood min) but covers most
    overlap = ((a < -0.05) & (b < -0.05)).sum()
    assert overlap > 0.9 * (a < -0.05).sum()
    # and never carves where XLA says occupied
    assert ((a > 0.5) & (b < -0.05)).sum() == 0


def test_pallas_update_enable_gate():
    pose, ranges = _scan()
    grid = make_grid(GCFG)
    out = pallas_dense_update(
        grid, pose, ranges, GCFG, SENSOR, enable=0.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_pallas_update_window_origin():
    pose, ranges = _scan()
    grid = jnp.zeros((128, 128), jnp.float32)
    # window anchored at world (-6.4, -6.4) == the grid's own origin
    out = pallas_dense_update(
        grid, pose, ranges, GCFG, SENSOR,
        origin_xy=(GCFG.origin_x, GCFG.origin_y), interpret=True,
    )
    ref = pallas_dense_update(grid, pose, ranges, GCFG, SENSOR, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_pallas_update_bf16_dtype():
    pose, ranges = _scan()
    grid = make_grid(GCFG, dtype=jnp.bfloat16)
    out = pallas_dense_update(grid, pose, ranges, GCFG, SENSOR, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = pallas_dense_update(
        make_grid(GCFG), pose, ranges, GCFG, SENSOR, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.02
    )
