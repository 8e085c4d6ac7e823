from slam2d_tpu.viz.render import render_map, save_map_png  # noqa: F401
