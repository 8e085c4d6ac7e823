"""Mesh-sharded tile pool == single-device tile pool (8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from slam2d_tpu.grid.tiles import (
    TileConfig,
    TileTable,
    gather_region,
    scatter_region,
    tiled_init,
)
from slam2d_tpu.grid.tiles_sharded import (
    gather_region_sharded,
    scatter_region_sharded,
)
from slam2d_tpu.parallel.mesh import make_particle_mesh

CFG = TileConfig(tile=64, n_slots=16, resolution=0.1)
AXIS = "particles"


def _setup():
    g = tiled_init(CFG)
    table = TileTable(CFG)
    g = table.activate(g, [(0, 0), (0, 1), (1, 0), (1, 1), (-1, 0)])
    return g


def test_sharded_roundtrip_matches_single_device():
    mesh = make_particle_mesh(8)
    g = _setup()
    size = 96
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(size, size)).astype(np.float32))
    origin = jnp.asarray([20, 30], jnp.int32)

    # single-device reference
    ref = gather_region(scatter_region(g, CFG, win, origin), CFG, origin, size)

    # sharded: slot axis split over the mesh. 17 slots (16 + trash) don't
    # divide 8 — pad the pool to a multiple of the mesh for the test.
    n_pad = 24
    tiles = jnp.zeros((n_pad, CFG.tile, CFG.tile), jnp.float32)
    tiles = tiles.at[: g.tiles.shape[0]].set(g.tiles)
    coords = g.coords  # replicated; global slot ids unchanged

    def step(tiles_local, coords, win, origin):
        tl = scatter_region_sharded(tiles_local, coords, CFG, win, origin, AXIS)
        out = gather_region_sharded(tl, coords, CFG, origin, size, AXIS)
        return tl, out

    sharded = jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(AXIS), P(None), P(None), P(None)),
            out_specs=(P(AXIS), P(None)),
            check_vma=False,
        )
    )
    tiles2, got = sharded(tiles, coords, win, origin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # the content landed distributed: no single shard holds everything
    t2 = np.asarray(tiles2)
    touched = [k for k in range(n_pad) if np.abs(t2[k]).sum() > 0]
    assert len(touched) >= 2


def test_sharded_gather_missing_tiles_zero():
    mesh = make_particle_mesh(8)
    g = _setup()
    n_pad = 24
    tiles = jnp.zeros((n_pad, CFG.tile, CFG.tile), jnp.float32)
    tiles = tiles.at[: g.tiles.shape[0]].set(g.tiles)

    def step(tiles_local, coords):
        return gather_region_sharded(
            tiles_local, coords, CFG, jnp.asarray([-500, -500], jnp.int32),
            96, AXIS,
        )

    sharded = jax.jit(
        jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(AXIS), P(None)), out_specs=P(None),
            check_vma=False,
        )
    )
    out = sharded(tiles, g.coords)
    np.testing.assert_allclose(np.asarray(out), 0.0)
