from slam2d_tpu.graph.se2_graph import (  # noqa: F401
    PoseGraph,
    add_edge,
    add_node,
    edge_residuals,
    graph_init,
    make_optimize_sharded,
    optimize,
)
