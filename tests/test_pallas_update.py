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


def test_pallas_update_short_ranges_early_out():
    """Scan with ranges far below max_range: the kernel's range early-out
    clips most tiles to zero beam-loop trips; cells beyond the touchable
    disk must stay exactly zero and near cells must match XLA dense."""
    pose = jnp.asarray([0.3, -0.2, 0.4], jnp.float32)
    ranges = jnp.full((SENSOR.n_beams,), 1.5, jnp.float32)
    grid = make_grid(GCFG)
    a = np.asarray(raycast_update_dense(grid, pose, ranges, GCFG, SENSOR))
    b = np.asarray(
        pallas_dense_update(grid, pose, ranges, GCFG, SENSOR, interpret=True)
    )
    assert (np.abs(b) > 0).sum() > 0            # something was marked
    # nothing outside the 1.5 m disk (+ occ tol) may be touched
    H, W = b.shape
    ys = (np.arange(H) + 0.5) * GCFG.resolution + GCFG.origin_y - pose[1]
    xs = (np.arange(W) + 0.5) * GCFG.resolution + GCFG.origin_x - pose[0]
    d = np.hypot(ys[:, None], xs[None, :])
    far = d > 1.5 + 0.75 * GCFG.resolution
    np.testing.assert_allclose(b[far], 0.0)
    # same containment invariants as the long-range test
    assert ((a > 0.5) & ~(b > 0.5)).sum() == 0
    assert ((a > 0.5) & (b < -0.05)).sum() == 0


def test_pallas_update_all_invalid_scan():
    """No valid beams (all at/below min_range, NaN, or inf): output must
    equal the input map bit-for-bit (the early-out skips every tile)."""
    pose = jnp.asarray([0.3, -0.2, 0.4], jnp.float32)
    ranges = jnp.asarray(
        [0.0] * 30 + [np.nan] * 30 + [np.inf] * 30, jnp.float32
    )
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.normal(0, 1, (256, 256)).astype(np.float32))
    out = pallas_dense_update(grid, pose, ranges, GCFG, SENSOR, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.clip(np.asarray(grid), -GCFG.l_clamp, GCFG.l_clamp)
    )


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
