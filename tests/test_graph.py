import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import GraphConfig
from slam2d_tpu.core import se2
from slam2d_tpu.graph.se2_graph import (
    add_edge,
    add_node,
    edge_residuals,
    graph_init,
    make_optimize_sharded,
    optimize,
)
from slam2d_tpu.parallel.mesh import make_particle_mesh

CFG = GraphConfig(max_nodes=64, max_edges=128, gn_iters=15)


def _square_loop_graph(drift=0.15, n_side=4, info=100.0):
    """Ground truth: square loop of 4*n_side unit steps. Odometry edges carry
    drift in x; one loop-closure edge ties last node back to node 0."""
    rng = np.random.default_rng(0)
    g = graph_init(CFG)

    # ground-truth poses around the square
    gt = [np.array([0.0, 0.0, 0.0])]
    true_deltas = []
    for leg in range(4):
        for s in range(n_side):
            d = np.array([1.0, 0.0, np.pi / 2 if s == n_side - 1 else 0.0])
            true_deltas.append(d)
            prev = gt[-1]
            c, si = np.cos(prev[2]), np.sin(prev[2])
            gt.append(
                np.array(
                    [
                        prev[0] + c * d[0] - si * d[1],
                        prev[1] + si * d[0] + c * d[1],
                        (prev[2] + d[2] + np.pi) % (2 * np.pi) - np.pi,
                    ]
                )
            )
    gt = np.stack(gt)

    # drifting odometry estimate: scale x of every delta
    est = [gt[0]]
    for d in true_deltas:
        dn = d + np.array([drift * rng.uniform(0.5, 1.0), 0.0, 0.0])
        prev = est[-1]
        c, si = np.cos(prev[2]), np.sin(prev[2])
        est.append(
            np.array(
                [
                    prev[0] + c * dn[0] - si * dn[1],
                    prev[1] + si * dn[0] + c * dn[1],
                    (prev[2] + dn[2] + np.pi) % (2 * np.pi) - np.pi,
                ]
            )
        )
    est = np.stack(est)

    for p in est:
        g = add_node(g, jnp.asarray(p, jnp.float32))
    omega = jnp.eye(3) * info
    for k, d in enumerate(true_deltas):
        g = add_edge(g, k, k + 1, jnp.asarray(d, jnp.float32), omega)
    # loop closure: last node == first node (true relative pose identity)
    g = add_edge(
        g, len(est) - 1, 0, jnp.zeros(3, jnp.float32), omega * 10.0
    )
    return g, gt, est


def test_residual_zero_on_perfect_graph():
    g, gt, _ = _square_loop_graph(drift=0.0)
    g = g._replace(poses=g.poses.at[: len(gt)].set(jnp.asarray(gt, jnp.float32)))
    r = np.asarray(
        edge_residuals(g.poses, g.edges_ij, g.edges_z)[: int(g.n_edges)]
    )
    np.testing.assert_allclose(r, 0.0, atol=1e-5)


def test_optimize_closes_the_loop():
    g, gt, est = _square_loop_graph(drift=0.15)
    n = int(g.n_nodes)
    err_before = np.abs(np.asarray(g.poses[:n, :2]) - gt[:, :2]).max()

    g2, chi = optimize(g, CFG)
    p2 = np.asarray(g2.poses[:n])
    err_after = np.abs(p2[:, :2] - gt[:, :2]).max()

    assert err_after < 0.35 * err_before
    # anchor stays put
    np.testing.assert_allclose(p2[0], gt[0], atol=1e-3)
    # loop edge satisfied: last pose back near the origin
    assert np.hypot(p2[-1, 0], p2[-1, 1]) < 0.2


def test_optimize_sharded_matches_dense():
    g, gt, est = _square_loop_graph(drift=0.15)
    g_dense, _ = optimize(g, CFG)

    mesh = make_particle_mesh(8)
    run = make_optimize_sharded(CFG, mesh)
    g_shard, _ = run(g)

    n = int(g.n_nodes)
    np.testing.assert_allclose(
        np.asarray(g_shard.poses[:n]), np.asarray(g_dense.poses[:n]),
        atol=5e-3,
    )
