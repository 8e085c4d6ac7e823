from slam2d_tpu.grid.occupancy import (  # noqa: F401
    cell_center_world,
    integrate_scan,
    make_grid,
    occupancy_prob,
    raycast_update,
    raycast_update_dense,
    world_to_cell,
    world_to_cell_float,
)
