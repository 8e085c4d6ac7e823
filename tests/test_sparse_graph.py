"""Matrix-free pose-graph optimizer (graph/sparse.py): parity with the
dense solver on small graphs, and the 4096-node multi-loop stress the
dense [3K, 3K] path cannot reach memory-sanely (VERDICT r3 item 6)."""

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import GraphConfig
from slam2d_tpu.graph.se2_graph import graph_init, optimize
from slam2d_tpu.graph.sparse import (
    _assemble_sparse,
    _tridiag_apply,
    _tridiag_factor,
    optimize_cg,
)
from tests.test_graph import CFG, _square_loop_graph


def _pose_diff(a, b):
    """Max |a - b| with theta compared on the circle (a converged
    heading of pi vs -pi is the same pose, not a 2*pi error)."""
    d = np.abs(np.asarray(a) - np.asarray(b))
    d[:, 2] = np.abs(
        (np.asarray(a)[:, 2] - np.asarray(b)[:, 2] + np.pi)
        % (2 * np.pi) - np.pi
    )
    return d.max()


def test_tridiag_solve_matches_dense():
    """T x = r via Thomas factor + affine scans == dense np.linalg.solve
    on a random SPD block-tridiagonal system."""
    rng = np.random.default_rng(3)
    K = 17
    D = np.zeros((K, 3, 3), np.float32)
    O = np.zeros((K, 3, 3), np.float32)
    for k in range(K):
        a = rng.normal(size=(3, 3))
        D[k] = a @ a.T + 4.0 * np.eye(3)
        if k < K - 1:
            O[k] = 0.5 * rng.normal(size=(3, 3))
    T = np.zeros((3 * K, 3 * K), np.float64)
    for k in range(K):
        T[3 * k : 3 * k + 3, 3 * k : 3 * k + 3] = D[k]
        if k < K - 1:
            T[3 * k : 3 * k + 3, 3 * k + 3 : 3 * k + 6] = O[k]
            T[3 * k + 3 : 3 * k + 6, 3 * k : 3 * k + 3] = O[k].T
    r = rng.normal(size=(K, 3)).astype(np.float32)
    want = np.linalg.solve(T, r.reshape(-1)).reshape(K, 3)

    Cinv = _tridiag_factor(jnp.asarray(D), jnp.asarray(O))
    got = np.asarray(_tridiag_apply(Cinv, jnp.asarray(O), jnp.asarray(r)))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_assemble_matches_dense_H():
    """Sparse (D, O, b) + edge blocks reassembled == dense
    assemble_normal_eq + the _gn_iterate diagonal terms."""
    from slam2d_tpu.graph.se2_graph import assemble_normal_eq

    g, _, _ = _square_loop_graph(drift=0.15)
    K = g.poses.shape[0]
    n = int(g.n_nodes)
    with jax.default_matmul_precision("highest"):
        Hd, bd, chid = assemble_normal_eq(
            g.poses, g.edges_ij, g.edges_z, g.edges_omega, g.edge_mask, K
        )
        D, O, b, chi, free, (Hii, Hij, Hjj) = _assemble_sparse(
            g.poses, g, None, CFG.damping
        )
    # rebuild dense H from the raw edge blocks
    H = np.zeros((3 * K, 3 * K), np.float64)
    ij = np.asarray(g.edges_ij)
    for e in range(int(g.n_edges)):
        i, j = ij[e]
        H[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] += np.asarray(Hii[e])
        H[3 * j : 3 * j + 3, 3 * j : 3 * j + 3] += np.asarray(Hjj[e])
        H[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] += np.asarray(Hij[e])
        H[3 * j : 3 * j + 3, 3 * i : 3 * i + 3] += np.asarray(Hij[e]).T
    np.testing.assert_allclose(H, np.asarray(Hd, np.float64), atol=1e-2)
    np.testing.assert_allclose(float(chi), float(chid), rtol=1e-5)
    # projection: node 0 clamped (identity diag, zero gradient), inactive
    # slots likewise; free nodes carry dense diag + damping and dense b
    fr = np.asarray(free)
    np.testing.assert_array_equal(fr[0], 0.0)
    np.testing.assert_allclose(np.asarray(D[0]), np.eye(3))
    np.testing.assert_allclose(np.asarray(b[0]), 0.0)
    for k in range(1, n):
        want = np.asarray(Hd)[3 * k : 3 * k + 3, 3 * k : 3 * k + 3] + (
            CFG.damping * np.eye(3)
        )
        np.testing.assert_allclose(np.asarray(D[k]), want, atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(bd)[3 * k : 3 * k + 3], atol=1e-3
        )
    # chain off-diagonals: O[k] == dense block (k, k+1) for free pairs
    for k in range(1, n - 1):
        np.testing.assert_allclose(
            np.asarray(O[k]),
            np.asarray(Hd)[3 * k : 3 * k + 3, 3 * k + 3 : 3 * k + 6],
            atol=1e-2,
        )
    np.testing.assert_allclose(np.asarray(O[0]), 0.0)  # pair (0, 1) clamped


def test_optimize_cg_matches_dense():
    """optimize_cg == se2_graph.optimize on the square-loop graph."""
    g, gt, _ = _square_loop_graph(drift=0.15)
    n = int(g.n_nodes)
    g_d, chi_d = optimize(g, CFG)
    g_s, chi_s = optimize_cg(g, CFG)
    assert _pose_diff(g_s.poses[:n], g_d.poses[:n]) < 1e-3
    assert abs(float(chi_s) - float(chi_d)) < 1e-2 * max(1.0, float(chi_d))
    # and it actually closes the loop
    err = np.abs(np.asarray(g_s.poses[:n, :2]) - gt[:, :2]).max()
    assert err < 0.1


def test_optimize_cg_robust_matches_dense():
    """Robust kernels (DCS + GNC) reweight identically in both solvers."""
    cfg = GraphConfig(
        max_nodes=64, max_edges=128, gn_iters=15,
        robust_kind="dcs", robust_delta=3.0, robust_gnc_iters=2,
    )
    g, gt, _ = _square_loop_graph(drift=0.15)
    # inject a grossly false loop edge (3 m off) that DCS must reject
    from slam2d_tpu.graph.se2_graph import add_edge

    g = add_edge(
        g, int(g.n_nodes) - 3, 1,
        jnp.asarray([3.0, 0.0, 0.0], jnp.float32), jnp.eye(3) * 1000.0,
    )
    n = int(g.n_nodes)
    g_d, _ = optimize(g, cfg)
    g_s, _ = optimize_cg(g, cfg)
    assert _pose_diff(g_s.poses[:n], g_d.poses[:n]) < 2e-3


def _serpentine_graph(K: int, n_loops: int, seed=0, drift=0.02):
    """K-node serpentine corridor sweep with n_loops rung closures between
    adjacent passes — the multi-loop stress trajectory (VERDICT r3 item 6).
    Built straight into numpy arrays (adding 4096 nodes through .at[].set
    would itself be the bug the HostGraph exists to avoid)."""
    rng = np.random.default_rng(seed)
    cfg = GraphConfig(
        max_nodes=K, max_edges=K + n_loops + 8, gn_iters=6,
        
    )
    leg = 64                       # nodes per straight pass
    gt = np.zeros((K, 3))
    true_d = np.zeros((K - 1, 3))
    for k in range(1, K):
        pass_i, s = divmod(k, leg)
        if s == 0:
            true_d[k - 1] = [0.0, 1.0, np.pi]  # u-turn rung: sidestep + flip
        else:
            true_d[k - 1] = [1.0, 0.0, 0.0]
        p = gt[k - 1]
        c, si = np.cos(p[2]), np.sin(p[2])
        d = true_d[k - 1]
        gt[k] = [
            p[0] + c * d[0] - si * d[1],
            p[1] + si * d[0] + c * d[1],
            (p[2] + d[2] + np.pi) % (2 * np.pi) - np.pi,
        ]
    est = np.zeros_like(gt)
    est[0] = gt[0]
    for k in range(1, K):
        dn = true_d[k - 1] + rng.normal(0, drift, 3) * [1, 1, 0.3]
        p = est[k - 1]
        c, si = np.cos(p[2]), np.sin(p[2])
        est[k] = [
            p[0] + c * dn[0] - si * dn[1],
            p[1] + si * dn[0] + c * dn[1],
            (p[2] + dn[2] + np.pi) % (2 * np.pi) - np.pi,
        ]

    g = graph_init(cfg)
    E = K - 1 + n_loops
    poses = np.zeros((K, 3), np.float32)
    poses[:] = est
    edges_ij = np.zeros((cfg.max_edges, 2), np.int32)
    edges_z = np.zeros((cfg.max_edges, 3), np.float32)
    omegas = np.zeros((cfg.max_edges, 3, 3), np.float32)
    emask = np.zeros(cfg.max_edges, bool)
    edges_ij[: K - 1] = np.stack([np.arange(K - 1), np.arange(1, K)], 1)
    edges_z[: K - 1] = true_d
    omegas[: K - 1] = np.eye(3) * 100.0
    # loop closures: same-column nodes on adjacent passes (true relative
    # pose from ground truth)
    def rel(a, b):
        d = gt[b] - gt[a]
        c, si = np.cos(gt[a][2]), np.sin(gt[a][2])
        return np.array(
            [c * d[0] + si * d[1], -si * d[0] + c * d[1],
             (gt[b][2] - gt[a][2] + np.pi) % (2 * np.pi) - np.pi]
        )
    n_pass = K // leg
    li = 0
    for li in range(n_loops):
        pass_i = 1 + (li % max(1, n_pass - 1))
        s = int(rng.integers(4, leg - 4))
        a = (pass_i - 1) * leg + s
        b = pass_i * leg + (leg - 1 - s)  # same corridor column, next pass
        if b >= K:
            continue
        edges_ij[K - 1 + li] = (a, b)
        edges_z[K - 1 + li] = rel(a, b)
        omegas[K - 1 + li] = np.eye(3) * 400.0
    emask[: K - 1 + n_loops] = True

    g = g._replace(
        poses=jnp.asarray(poses),
        node_mask=jnp.ones(K, bool),
        n_nodes=jnp.int32(K),
        edges_ij=jnp.asarray(edges_ij),
        edges_z=jnp.asarray(edges_z),
        edges_omega=jnp.asarray(omegas),
        edge_mask=jnp.asarray(emask),
        n_edges=jnp.int32(K - 1 + n_loops),
    )
    return g, gt, est, cfg


def test_optimize_hier_4096_nodes():
    """4096 keyframes, 120 loop edges (one closure per ~34 keyframes —
    realistic revisit density): the dense path would materialize a
    151 MB H per GN iteration (and was never exercised past ~1k). The
    hierarchical solver must cut trajectory error by >= 5x; measured
    3.37 -> 0.056 m (flat f32 PCG stalls at ~1.4 — the f32 low-mode
    floor the anchor-graph stage exists to beat)."""
    import dataclasses

    from slam2d_tpu.graph.sparse import optimize_hier

    K = 4096
    g, gt, est, cfg = _serpentine_graph(K, n_loops=120, drift=0.01)
    cfg = dataclasses.replace(cfg, sparse_max_loops=128)
    err_before = float(
        np.sqrt(np.mean(np.sum((est[:, :2] - gt[:, :2]) ** 2, axis=1)))
    )
    g2, chi = optimize_hier(g, cfg)
    out = np.asarray(g2.poses)
    err_after = float(
        np.sqrt(np.mean(np.sum((out[:, :2] - gt[:, :2]) ** 2, axis=1)))
    )
    assert np.isfinite(out).all()
    assert err_after < err_before / 5.0, (err_before, err_after)
    assert float(chi) < 1.0


def test_coarse_graph_stride_divides_n_nodes():
    """Regression (round-4 review): with n_nodes a multiple of
    sparse_coarse_stride and spare node capacity — the normal full-SLAM
    driver case — the coarse graph must NOT activate a chain edge from
    the last real anchor to an inactive zero-pose anchor."""
    import dataclasses

    from slam2d_tpu.config import GraphConfig
    from slam2d_tpu.graph.sparse import _coarse_graph, optimize_hier
    from slam2d_tpu.graph.se2_graph import HostGraph

    cfg = GraphConfig(max_nodes=64, max_edges=256, gn_iters=10,
                      sparse_coarse_stride=8, sparse_max_loops=8)
    g = HostGraph(cfg)
    # straight 32-node chain along +x, exact measurements
    import numpy as np_

    for k in range(32):
        g.add_node(np_.array([float(k), 0.0, 0.0]))
        if k:
            g.add_edge(k - 1, k, np_.array([1.0, 0.0, 0.0]),
                       np_.eye(3) * 100.0)
    dev = g.to_device()
    gc, ccfg, anchors = _coarse_graph(dev, cfg, 8, 8)
    em = np.asarray(gc.edge_mask)
    # active coarse nodes = ceil(32/8) = 4 -> exactly 3 active chain edges
    assert em[:7].sum() == 3, em[:7]
    g2, chi = optimize_hier(dev, cfg)
    out = np.asarray(g2.poses)[:32]
    want = np.stack([np.arange(32, dtype=np.float64),
                     np.zeros(32), np.zeros(32)], axis=1)
    np.testing.assert_allclose(out, want, atol=1e-3)
    assert float(chi) < 1e-4


def test_optimize_cg_sharded_matches_single():
    """Edge-sharded matrix-free GN (psum-reduced assembly/matvec,
    shard-invariant preconditioner) == optimize_cg on the 8-virtual-
    device mesh."""
    from slam2d_tpu.graph.sparse import optimize_cg_sharded
    from slam2d_tpu.parallel.mesh import make_particle_mesh

    g, gt, _ = _square_loop_graph(drift=0.15)
    n = int(g.n_nodes)
    mesh = make_particle_mesh(8)
    g_s, chi_s = optimize_cg(g, CFG)
    g_m, chi_m = optimize_cg_sharded(g, CFG, mesh)
    assert _pose_diff(g_m.poses[:n], g_s.poses[:n]) < 2e-3
    assert abs(float(chi_m) - float(chi_s)) < 1e-2 * max(1.0, float(chi_s))
