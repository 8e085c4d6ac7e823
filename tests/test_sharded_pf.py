"""Sharded FastSLAM over the 8-virtual-CPU-device mesh (SURVEY.md §6
"Multi-device tests without a cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam2d_tpu.config import (
    FrontendConfig,
    GridConfig,
    MatcherConfig,
    PFConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.parallel.mesh import make_particle_mesh
from slam2d_tpu.pf.sharded import (
    make_sharded_chunk_fn,
    make_sharded_step,
    sharded_fastslam_init,
)


def _cfg():
    return (
        FrontendConfig(
            sensor=SensorConfig(n_beams=60, max_range=12.0),
            grid=GridConfig(
                height=128, width=128, resolution=0.1, ray_samples=64,
                center_x=6.0, center_y=6.0,
            ),
            matcher=MatcherConfig(search_xy=0.2, search_theta=0.1, n_theta=5),
            chunk=4,
            bootstrap_dist=1.0,
        ),
        PFConfig(n_particles=16, noise_xy=0.02, noise_theta=0.01),
    )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_particle_mesh(8)


def test_sharded_step_matches_shapes(mesh):
    cfg, pf = _cfg()
    state = sharded_fastslam_init(cfg, pf, jax.random.PRNGKey(0), mesh)
    step = make_sharded_step(cfg, pf, mesh)

    world = SynthWorld.box_rooms(12.0)
    r = world.raycast(
        np.zeros(3), np.asarray(cfg.sensor.beam_angles()), cfg.sensor.max_range
    )
    state2, (bp, n_eff, sc) = jax.jit(step)(
        state, jnp.zeros(3), jnp.asarray(r, jnp.float32)
    )
    assert state2.logodds.shape == (pf.n_particles, 128, 128)
    assert bp.shape == (3,)
    assert 1.0 - 1e-3 <= float(n_eff) <= pf.n_particles + 1e-3
    assert np.isfinite(np.asarray(state2.poses)).all()


def test_sharded_tracks_synthetic_log(mesh):
    cfg, pf = _cfg()
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0], [6.5, 7.0]])
    log = simulate_log(
        world, wp, cfg.sensor, step=0.2,
        odom_noise_xy=0.012, odom_noise_theta=0.006, seed=3,
    )
    state = sharded_fastslam_init(
        cfg, pf, jax.random.PRNGKey(1), mesh, start_pose=log["odom"][0]
    )
    state = state._replace(prev_odom=jnp.asarray(log["odom"][0]))
    chunk_fn = make_sharded_chunk_fn(cfg, pf, mesh)

    T = len(log["odom"])
    K = cfg.chunk
    traj = []
    for s in range(0, T - T % K, K):
        o = jnp.asarray(log["odom"][s : s + K])
        r = jnp.asarray(log["ranges"][s : s + K])
        state, (bp, ne, sc) = chunk_fn(state, o, r)
        traj.append(np.asarray(bp))
    traj = np.concatenate(traj)
    gt = log["gt_poses"][: len(traj)]
    assert np.isfinite(traj).all()
    ate = ate_rmse(traj, gt, align=False)
    assert ate < 0.6  # tracks (coarse bound; tiny grid, few particles)


def test_sharded_resample_migrates_across_shards(mesh):
    """Force degenerate weights: every particle must adopt the winning
    particle's pose even across shard boundaries (the psum exchange)."""
    cfg, pf = _cfg()
    state = sharded_fastslam_init(cfg, pf, jax.random.PRNGKey(2), mesh)
    # winner lives on the LAST shard (global index 15)
    bad_w = np.full(pf.n_particles, -60.0, np.float32)
    bad_w[15] = 0.0
    poses = np.zeros((pf.n_particles, 3), np.float32)
    poses[15] = [5.0, 5.0, 0.5]
    maps = np.zeros((pf.n_particles, 128, 128), np.float32)
    maps[15, 64, 64] = 3.0
    state = state._replace(
        log_w=jnp.asarray(bad_w),
        poses=jnp.asarray(poses),
        logodds=jnp.asarray(maps),
        dist=jnp.float32(100.0),          # out of bootstrap
        since_match=jnp.float32(100.0),   # refinement due this scan
    )
    state = jax.device_put(
        state,
        __import__("slam2d_tpu.pf.sharded", fromlist=["x"]).sharded_state_sharding(mesh),
    )
    step = make_sharded_step(cfg, pf, mesh)
    world = SynthWorld.box_rooms(12.0)
    r = world.raycast(
        np.array([5.0, 5.0, 0.5]),
        np.asarray(cfg.sensor.beam_angles()),
        cfg.sensor.max_range,
    )
    state2, _ = jax.jit(step)(state, jnp.zeros(3), jnp.asarray(r, jnp.float32))
    p2 = np.asarray(state2.poses)
    # all particles cluster near the winner (within proposal noise)
    assert np.all(np.abs(p2[:, 0] - 5.0) < 0.5)
    assert np.all(np.abs(p2[:, 1] - 5.0) < 0.5)
    m2 = np.asarray(state2.logodds)
    # the winner's map content replicated to every particle
    assert np.all(m2[:, 64, 64] > 1.0)


def test_bounded_ring_matches_full_unroll():
    """The ancestor-distance-bounded ring exchange must equal the full
    static unroll for ANY ancestor pattern — including all-local (0 hops)
    and worst-case max-distance migration."""
    from functools import partial

    from jax.sharding import PartitionSpec as PS
    from jax import shard_map

    n_shards, Pl, N = 8, 3, 64
    P = n_shards * Pl
    mesh = make_particle_mesh(n_shards)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    axis = mesh.axis_names[0]

    def bounded(maps_flat, idx, shard):
        k_need = jnp.mod(shard - idx // Pl, n_shards)
        d_max = jax.lax.pmax(jnp.max(k_need), axis)

        def contrib(k, blk):
            src = jnp.mod(shard - k, n_shards)
            gidx = src * Pl + jnp.arange(Pl, dtype=jnp.int32)
            m = (idx[:, None] == gidx[None, :]).astype(maps_flat.dtype)
            return jnp.dot(m, blk, preferred_element_type=jnp.float32
                           ).astype(maps_flat.dtype)

        def body(c):
            k, blk, out = c
            blk = jax.lax.ppermute(blk, axis, perm)
            return k + 1, blk, out + contrib(k, blk)

        _, _, out = jax.lax.while_loop(
            lambda c: c[0] <= d_max, body,
            (jnp.int32(1), maps_flat, contrib(0, maps_flat)))
        return out

    def run(ancestors):
        @partial(
            shard_map, mesh=mesh,
            in_specs=(PS(axis), PS(axis)),
            out_specs=PS(axis),
        )
        def f(maps, idx):
            shard = jax.lax.axis_index(axis)
            return bounded(maps, idx[:, 0], shard)

        maps = jnp.arange(P * N, dtype=jnp.float32).reshape(P, N) + 1.0
        out = np.asarray(f(maps, ancestors.reshape(P, 1)))
        want = np.asarray(maps)[np.asarray(ancestors)]
        np.testing.assert_array_equal(out, want)

    rng = np.random.default_rng(0)
    run(jnp.arange(P, dtype=jnp.int32))                       # all local
    run(jnp.asarray(rng.integers(0, P, P), jnp.int32))        # random
    run(jnp.mod(jnp.arange(P, dtype=jnp.int32) + Pl, P))      # +1 shard
    run(jnp.full((P,), P - 1, jnp.int32))                     # worst case


def test_host_gated_sharded_matches_ungated():
    """The host-gated sharded driver (stage-specialized shard_map programs
    + sharded light chunks) must reproduce the single-program lax.cond
    form: same RNG stream, same collectives, same trajectory."""
    from slam2d_tpu.run.sharded_run import run_sharded_fastslam

    cfg, pf = _cfg()
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[2.0, 2.0], [2.0, 9.0], [9.0, 9.0], [9.0, 2.5]])
    log = simulate_log(world, wp, cfg.sensor, step=0.2, seed=3)

    _, tr_u, ne_u, sc_u = run_sharded_fastslam(
        log, cfg, pf, seed=0, host_gated=False
    )
    st_g, tr_g, ne_g, sc_g = run_sharded_fastslam(
        log, cfg, pf, seed=0, host_gated=True
    )
    np.testing.assert_allclose(tr_g, tr_u, atol=1e-4)
    np.testing.assert_allclose(ne_g, ne_u, rtol=1e-4)
    assert np.isfinite(np.asarray(st_g.logodds)).all()
