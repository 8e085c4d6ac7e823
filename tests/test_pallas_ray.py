"""Pallas exact-ray update variants vs the sparse sampled-ray oracle
(VERDICT r1 item 6: "Pallas DDA raycast + scatter-add" semantics).

The "ray" variant computes in closed form what raycast_update's point
sampling estimates: per-cell free evidence = chord length through the
cell / max(res, sample spacing) summed over beams, occupied = l_occ per
hitting beam whose endpoint cell is this cell. Runs in interpret mode on
CPU; chip parity is exercised by scripts/tpu_smoke.py."""

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import GridConfig, SensorConfig
from slam2d_tpu.grid.occupancy import raycast_update
from slam2d_tpu.ops.pallas_update import pallas_dense_update

GCFG = GridConfig(height=128, width=128, resolution=0.1,
                  center_x=6.0, center_y=6.0, ray_samples=192,
                  l_clamp=1000.0)   # no clamp: compare raw accumulations
SENSOR = SensorConfig(n_beams=60, max_range=6.0)


def _scan(seed):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0.5, 7.0, SENSOR.n_beams).astype(np.float32)
    r[rng.uniform(size=SENSOR.n_beams) < 0.2] = 81.9   # no-hit beams
    return jnp.asarray(r)


def _split_channels(upd):
    """Separate free (negative) and occ (positive) contributions of a
    fresh-grid update image: cells can hold both, but occ is an exact
    multiple of l_occ in the ray variant and the sparse path alike only
    where no free overlaps — so compare via masked totals instead."""
    return upd


def test_ray_variant_matches_sparse_oracle():
    pose = jnp.asarray([6.3, 5.8, 0.7], jnp.float32)
    for seed in (0, 1):
        ranges = _scan(seed)
        zeros = jnp.zeros((GCFG.height, GCFG.width), jnp.float32)
        sparse = np.asarray(
            raycast_update(zeros, pose, ranges, GCFG, SENSOR)
        )
        ray = np.asarray(
            pallas_dense_update(
                zeros, pose, ranges, GCFG, SENSOR,
                interpret=True, variant="ray",
            )
        )
        # total free mass within a few % (sampling vs exact chords)
        free_s = sparse[sparse < 0].sum()
        free_r = ray[ray < 0].sum()
        assert abs(free_r - free_s) < 0.05 * abs(free_s), (free_s, free_r)
        # per-cell agreement within ~one sample weight + overlap noise
        # (measured: p99 0.09, mean 0.006)
        diff = np.abs(ray - sparse)
        assert np.percentile(diff, 99) < 0.3, np.percentile(diff, 99)
        assert diff.mean() < 0.02, diff.mean()
        # occupied channel in isolation (l_free=0): EXACT equality —
        # same endpoint lattice cells, same l_occ stacking
        import dataclasses

        g_occ = dataclasses.replace(GCFG, l_free=0.0)
        sparse_o = np.asarray(
            raycast_update(zeros, pose, ranges, g_occ, SENSOR)
        )
        ray_o = np.asarray(
            pallas_dense_update(
                zeros, pose, ranges, g_occ, SENSOR,
                interpret=True, variant="ray",
            )
        )
        np.testing.assert_allclose(ray_o, sparse_o, atol=1e-5)


def test_hybrid_variant_occ_matches_sparse_endpoints():
    pose = jnp.asarray([5.5, 6.2, -1.2], jnp.float32)
    ranges = _scan(3)
    zeros = jnp.zeros((GCFG.height, GCFG.width), jnp.float32)
    import dataclasses

    g_occ = dataclasses.replace(GCFG, l_free=0.0)
    sparse = np.asarray(raycast_update(zeros, pose, ranges, g_occ, SENSOR))
    hyb = np.asarray(
        pallas_dense_update(
            zeros, pose, ranges, g_occ, SENSOR,
            interpret=True, variant="hybrid",
        )
    )
    np.testing.assert_allclose(hyb, sparse, atol=1e-5)


# (the "ism" default variant is pinned by tests/test_pallas_update.py)
