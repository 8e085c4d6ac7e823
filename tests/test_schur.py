"""Block Schur-complement GN == dense GN on the loop graph."""

import numpy as np
import pytest

from slam2d_tpu.config import GraphConfig
from slam2d_tpu.graph.schur import build_plan, optimize_schur
from slam2d_tpu.graph.se2_graph import optimize

from tests.test_graph import CFG, _square_loop_graph


def test_plan_classifies_separators():
    g, gt, est = _square_loop_graph(drift=0.15)
    plan = build_plan(g, n_blocks=4)
    K = int(g.n_nodes)
    # anchor is a separator; every cross-block edge endpoint too
    assert 0 in plan.sep_ids
    # the chain has 3 interior boundaries (+ the loop edge): few separators
    assert 2 <= plan.n_sep <= 12
    # every active node is exactly one of interior/separator
    ints = plan.int_ids[plan.int_ids >= 0]
    all_ids = np.sort(np.concatenate([ints, plan.sep_ids]))
    np.testing.assert_array_equal(all_ids, np.arange(K))
    # every active edge assigned to exactly one block
    E = int(g.n_edges)
    counts = np.zeros(E, int)
    for b in range(plan.edge_idx.shape[0]):
        for k, e in enumerate(plan.edge_idx[b]):
            if plan.edge_mask[b, k]:
                counts[e] += 1
    np.testing.assert_array_equal(counts, 1)


def test_schur_sharded_matches_dense():
    from slam2d_tpu.graph.schur import optimize_schur_sharded
    from slam2d_tpu.parallel.mesh import make_particle_mesh

    g, gt, est = _square_loop_graph(drift=0.15)
    g_dense, _ = optimize(g, CFG)
    mesh = make_particle_mesh(4)
    g_shard, _ = optimize_schur_sharded(g, CFG, mesh, n_blocks=4)
    n = int(g.n_nodes)
    d = np.asarray(g_dense.poses[:n])
    s = np.asarray(g_shard.poses[:n])
    np.testing.assert_allclose(s[:, :2], d[:, :2], atol=5e-3)
    dth = (s[:, 2] - d[:, 2] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dth, 0.0, atol=5e-3)


@pytest.mark.parametrize("n_blocks", [2, 4])
def test_schur_matches_dense(n_blocks):
    g, gt, est = _square_loop_graph(drift=0.15)
    g_dense, _ = optimize(g, CFG)
    g_schur, _ = optimize_schur(g, CFG, n_blocks=n_blocks)
    n = int(g.n_nodes)
    d = np.asarray(g_dense.poses[:n])
    s = np.asarray(g_schur.poses[:n])
    np.testing.assert_allclose(s[:, :2], d[:, :2], atol=5e-3)
    dth = (s[:, 2] - d[:, 2] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dth, 0.0, atol=5e-3)
