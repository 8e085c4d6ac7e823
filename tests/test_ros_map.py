"""ROS map_server PGM/YAML export round-trip (viz/ros_map.py)."""

import numpy as np

from slam2d_tpu.config import GridConfig
from slam2d_tpu.grid.tiles import TileConfig, TileTable, tiled_init
from slam2d_tpu.viz.ros_map import (
    load_ros_map, save_ros_map, save_tiled_ros_map,
)

GCFG = GridConfig(height=64, width=96, resolution=0.05, center_x=1.0, center_y=2.0)


def test_roundtrip_trinary_and_geometry(tmp_path):
    lo = np.zeros((64, 96), np.float32)
    lo[10, 20] = 5.0     # occupied
    lo[30, 40] = -5.0    # free
    pgm, yaml = save_ros_map(str(tmp_path / "map"), lo, GCFG)

    with open(pgm, "rb") as f:
        data = f.read()
    assert data.startswith(b"P5\n96 64\n255\n")
    img = np.frombuffer(data.split(b"\n", 3)[3], np.uint8).reshape(64, 96)
    assert img[63 - 10, 20] == 0      # occupied, flipped to top-down rows
    assert img[63 - 30, 40] == 254    # free
    assert img[0, 0] == 205           # unknown

    back, gcfg2 = load_ros_map(yaml)
    assert back.shape == lo.shape
    assert back[10, 20] > 0.5 and back[30, 40] < -0.5 and back[0, 0] == 0.0
    assert abs(gcfg2.resolution - GCFG.resolution) < 1e-9
    assert abs(gcfg2.origin_x - GCFG.origin_x) < 1e-6
    assert abs(gcfg2.origin_y - GCFG.origin_y) < 1e-6


def test_tiled_export(tmp_path):
    tcfg = TileConfig(tile=64, n_slots=8, resolution=0.1)
    table = TileTable(tcfg)
    g = table.activate(tiled_init(tcfg), [(0, 0), (0, 1)])
    tiles = np.array(g.tiles, copy=True)
    tiles[0, 5, 6] = 5.0
    g = g._replace(tiles=tiles)
    pgm, yaml = save_tiled_ros_map(str(tmp_path / "tmap"), g, tcfg)
    back, gcfg = load_ros_map(yaml)
    assert back.shape == (64, 128)    # two stitched tiles
    assert (back > 0.5).sum() == 1
