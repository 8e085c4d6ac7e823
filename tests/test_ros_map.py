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


def test_load_real_ros_pgm_with_comment_and_trailing_newline(tmp_path):
    """Genuine ROS map_saver output has a '# CREATOR' comment line in the
    PGM header, and rasters that passed through text tools often carry a
    trailing newline — both must load byte-correctly."""
    H, W = 4, 8
    img = np.arange(H * W, dtype=np.uint8).reshape(H, W)
    pgm = tmp_path / "real.pgm"
    with open(pgm, "wb") as f:
        f.write(b"P5\n# CREATOR: map_saver.cpp 0.050 m/pix\n")
        f.write(f"{W} {H}\n255\n".encode())
        f.write(img.tobytes())
        f.write(b"\n")                       # trailing padding byte
    with open(tmp_path / "real.yaml", "w") as f:
        f.write(f"image: real.pgm\nresolution: 0.05\n"
                "origin: [0.0, 0.0, 0.0]\nnegate: 0\n"
                "occupied_thresh: 0.65\nfree_thresh: 0.196\n")
    lo, gcfg = load_ros_map(str(tmp_path / "real.yaml"))
    assert lo.shape == (H, W)
    # value 0 (top-left of the raster = row H-1 after the flip) is occupied
    assert lo[H - 1, 0] > 0.5
    # bright values are free; mid-grey unknown
    assert (lo < -0.5).sum() == 0            # all values <= 31: none free
    assert lo[0, 0] == 0.0 or lo[0, 0] > 0.5


def test_load_negated_map(tmp_path):
    """negate: 1 inverts pixel semantics (white = occupied)."""
    H, W = 2, 4
    img = np.full((H, W), 205, np.uint8)
    img[0, 0] = 254                          # white: occupied under negate
    img[1, 1] = 0                            # black: free under negate
    with open(tmp_path / "n.pgm", "wb") as f:
        f.write(f"P5\n{W} {H}\n255\n".encode() + img.tobytes())
    with open(tmp_path / "n.yaml", "w") as f:
        f.write("image: n.pgm\nresolution: 0.1\norigin: [0, 0, 0]\n"
                "negate: 1\noccupied_thresh: 0.65\nfree_thresh: 0.196\n")
    lo, _ = load_ros_map(str(tmp_path / "n.yaml"))
    assert lo[H - 1 - 0, 0] > 0.5            # the white pixel, flipped
    assert lo[H - 1 - 1, 1] < -0.5           # the black pixel
