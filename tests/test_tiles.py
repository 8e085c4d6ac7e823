import jax.numpy as jnp
import numpy as np

from slam2d_tpu.grid.tiles import (
    TileConfig,
    TileTable,
    gather_region,
    lookup_slot,
    required_tiles,
    scatter_region,
    tiled_init,
    world_to_cell_global,
)

CFG = TileConfig(tile=64, n_slots=8, resolution=0.1)


def test_lookup_and_activation():
    g = tiled_init(CFG)
    table = TileTable(CFG)
    g = table.activate(g, [(0, 0), (0, 1), (-1, 0)])
    slot, found = lookup_slot(g.coords, jnp.asarray([0, 1], jnp.int32))
    assert bool(found) and int(slot) == table.slot_of[(0, 1)]
    slot, found = lookup_slot(g.coords, jnp.asarray([5, 5], jnp.int32))
    assert not bool(found) and int(slot) == CFG.n_slots  # trash


def test_required_tiles_covers_reach():
    need = required_tiles(np.array([[0.1, 0.1]]), reach_m=7.0, CFG=None) if False else \
        required_tiles(np.array([[0.1, 0.1]]), 7.0, CFG)
    # 6.4 m tiles, reach 7 m => 3x3 neighborhood around tile (0, 0)
    assert (0, 0) in need and (-2, -2) in need and (1, 1) in need


def test_gather_scatter_roundtrip_across_tile_borders():
    g = tiled_init(CFG)
    table = TileTable(CFG)
    g = table.activate(g, [(0, 0), (0, 1), (1, 0), (1, 1)])

    size = 96  # spans a 2x2 tile corner
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(size, size)).astype(np.float32))
    origin = jnp.asarray([20, 30], jnp.int32)  # straddles the (64, 64) corner

    g2 = scatter_region(g, CFG, win, origin)
    got = gather_region(g2, CFG, origin, size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(win), atol=1e-6)

    # cells outside the window are untouched (still zero)
    outside = gather_region(g2, CFG, jnp.asarray([-40, -40], jnp.int32), 32)
    np.testing.assert_allclose(np.asarray(outside), 0.0)


def test_gather_missing_tiles_reads_zero_and_scatter_drops():
    g = tiled_init(CFG)
    table = TileTable(CFG)
    g = table.activate(g, [(0, 0)])
    size = 96
    win = jnp.ones((size, size), jnp.float32)
    origin = jnp.asarray([20, 30], jnp.int32)
    g2 = scatter_region(g, CFG, win, origin)
    got = np.asarray(gather_region(g2, CFG, origin, size))
    # region inside tile (0,0): written; region in missing tiles: zero
    assert got[0, 0] == 1.0          # global cell (20, 30) in tile (0, 0)
    assert got[-1, -1] == 0.0        # global cell (115, 125) in tile (1, 1) missing
    # trash slot absorbed writes without corrupting active tiles elsewhere
    far = np.asarray(gather_region(g2, CFG, jnp.asarray([0, 0], jnp.int32), 16))
    assert np.all(np.isfinite(far))


def test_world_to_cell_global():
    rc = np.asarray(world_to_cell_global(jnp.asarray([[0.05, -0.05]]), CFG))
    np.testing.assert_array_equal(rc[0], [-1, 0])


def test_stitch_and_render_tiled(tmp_path):
    import os

    import jax.numpy as jnp

    from slam2d_tpu.grid.tiles import stitch_tiles
    from slam2d_tpu.viz.render import save_tiled_map_png

    g = tiled_init(CFG)
    table = TileTable(CFG)
    g = table.activate(g, [(0, 0), (1, 1)])
    # mark one cell in each active tile
    tiles = g.tiles.at[table.slot_of[(0, 0)], 5, 6].set(3.0)
    tiles = tiles.at[table.slot_of[(1, 1)], 7, 8].set(3.0)
    g = g._replace(tiles=tiles)

    dense, (ox, oy) = stitch_tiles(g, CFG)
    assert dense.shape == (128, 128)  # 2x2 tile span
    assert dense[5, 6] == 3.0
    assert dense[64 + 7, 64 + 8] == 3.0
    assert (ox, oy) == (CFG.origin_x, CFG.origin_y)

    out = save_tiled_map_png(str(tmp_path / "t.png"), g, CFG)
    assert os.path.getsize(out) > 500
