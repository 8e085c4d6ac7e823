import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import (
    FrontendConfig,
    GridConfig,
    MatcherConfig,
    PFConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.pf.fastslam import (
    effective_sample_size,
    fastslam_init,
    systematic_ancestors,
)
from slam2d_tpu.run.fastslam_run import run_fastslam


def test_systematic_ancestors_uniform_weights():
    log_w = jnp.zeros(8)
    anc = np.asarray(systematic_ancestors(log_w, jnp.float32(0.5)))
    np.testing.assert_array_equal(anc, np.arange(8))


def test_systematic_ancestors_concentrated():
    log_w = jnp.asarray([-100.0, 0.0, -100.0, -100.0])
    anc = np.asarray(systematic_ancestors(log_w, jnp.float32(0.25)))
    np.testing.assert_array_equal(anc, [1, 1, 1, 1])


def test_systematic_ancestors_proportional():
    # weights 1/2, 1/4, 1/8, 1/8 over P=4 draws -> counts 2, 1, 0-1, 0-1;
    # systematic resampling guarantees count in {floor(P*w), ceil(P*w)}
    w = np.array([0.5, 0.25, 0.125, 0.125])
    anc = np.asarray(systematic_ancestors(jnp.asarray(np.log(w)), jnp.float32(0.3)))
    counts = np.bincount(anc, minlength=4)
    assert counts.sum() == 4
    for k in range(4):
        lo, hi = np.floor(4 * w[k]), np.ceil(4 * w[k])
        assert lo <= counts[k] <= hi


def test_effective_sample_size():
    assert abs(float(effective_sample_size(jnp.zeros(16))) - 16.0) < 1e-4
    conc = jnp.asarray([0.0] + [-100.0] * 15)
    assert float(effective_sample_size(conc)) < 1.01


def _pf_cfg():
    return (
        FrontendConfig(
            sensor=SensorConfig(n_beams=90, max_range=12.0),
            grid=GridConfig(
                height=192, width=192, resolution=0.1, ray_samples=96,
                center_x=6.0, center_y=6.0,
            ),
            matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=9),
            chunk=8,
            bootstrap_dist=1.5,
        ),
        PFConfig(n_particles=8, noise_xy=0.02, noise_theta=0.01),
    )


def test_fastslam_runs_and_tracks():
    cfg, pf = _pf_cfg()
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0]])
    log = simulate_log(
        world, wp, cfg.sensor, step=0.2,
        odom_noise_xy=0.012, odom_noise_theta=0.006, seed=11,
    )
    state, traj, n_eff, scores = run_fastslam(log, cfg, pf, seed=0)

    assert traj.shape == log["gt_poses"].shape
    assert np.isfinite(traj).all()
    # weights stay normalized-ish and N_eff within [1, P]
    assert np.all(n_eff >= 1.0 - 1e-3) and np.all(n_eff <= pf.n_particles + 1e-3)
    ate_pf = ate_rmse(traj, log["gt_poses"], align=False)
    ate_odom = ate_rmse(log["odom"], log["gt_poses"], align=False)
    # particle filter with per-particle matching should not be (much) worse
    # than raw odometry on a short log, and must stay in the same ballpark
    assert ate_pf < max(2.0 * ate_odom, 0.35)


def test_fastslam_resamples_on_degenerate_weights():
    cfg, pf = _pf_cfg()
    rng = jax.random.PRNGKey(0)
    state = fastslam_init(cfg, pf, rng, start_pose=jnp.zeros(3))
    # force concentrated weights and check a resample actually copies state
    bad_w = jnp.asarray([0.0] + [-50.0] * (pf.n_particles - 1))
    poses = jnp.arange(pf.n_particles * 3, dtype=jnp.float32).reshape(-1, 3)
    state = state._replace(
        log_w=bad_w, poses=poses,
        dist=jnp.float32(100.0),          # out of bootstrap
        since_match=jnp.float32(100.0),   # refinement due this scan
    )
    from slam2d_tpu.pf.fastslam import fastslam_step

    world = SynthWorld.box_rooms(12.0)
    r = world.raycast(np.zeros(3), np.asarray(cfg.sensor.beam_angles()), cfg.sensor.max_range)
    state2, _ = fastslam_step(
        state, jnp.zeros(3), jnp.asarray(r, jnp.float32), cfg, pf
    )
    # all particles should now descend from ancestor 0 (poses nearly equal)
    spread = np.asarray(state2.poses).std(axis=0).max()
    assert spread < 0.1
    np.testing.assert_allclose(
        np.asarray(state2.log_w), -np.log(pf.n_particles), atol=1e-4
    )


def test_refine_chunking_matches_unchunked():
    """lax.map-chunked refinement == one-shot vmap (same RNG stream)."""
    import dataclasses

    cfg, pf = _pf_cfg()
    pf_chunked = dataclasses.replace(pf, refine_chunk=4)
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0]])
    log = simulate_log(
        world, wp, cfg.sensor, step=0.2,
        odom_noise_xy=0.012, odom_noise_theta=0.006, seed=11,
    )
    _, t_a, n_a, _ = run_fastslam(log, cfg, pf, seed=0)
    _, t_b, n_b, _ = run_fastslam(log, cfg, pf_chunked, seed=0)
    # shared-mode refinement scores all particles through one matmul whose
    # M-dim is the chunk size, so chunking changes the fp reduction order;
    # O(1e-6) score noise compounds through argmax/subpeak over the run
    np.testing.assert_allclose(t_a, t_b, atol=1e-3)
    np.testing.assert_allclose(n_a, n_b, atol=0.05)


def test_host_gated_matches_ungated():
    """The host-gated dispatch strategy (stage-specialized programs, no
    map-shaped lax.cond) must reproduce the ungated lax.scan step: the
    host gate mirror replays the device gate logic on odometry and the
    RNG stream is split identically per scan (pads masked)."""
    from slam2d_tpu.run.fastslam_run import run_fastslam

    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=60, max_range=10.0),
        grid=GridConfig(height=160, width=160, resolution=0.1,
                        ray_samples=96, center_x=6.0, center_y=6.0),
        matcher=MatcherConfig(search_xy=0.2, search_theta=0.1, n_theta=7),
        chunk=8,
    )
    pf = PFConfig(n_particles=8, refine_mode="per_particle")
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0]])
    log = simulate_log(world, wp, cfg.sensor, step=0.2, seed=4)

    s1, tr1, ne1, sc1 = run_fastslam(log, cfg, pf, seed=1, host_gated=False)
    s2, tr2, ne2, sc2 = run_fastslam(log, cfg, pf, seed=1, host_gated=True)

    np.testing.assert_allclose(tr2, tr1, atol=1e-4)
    np.testing.assert_allclose(ne2, ne1, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(s2.logodds, np.float32),
        np.asarray(s1.logodds, np.float32), atol=1e-3,
    )


def test_fused_light_prefix_bit_identical():
    """fuse_light_prefix=N (light scans fused into the heavy dispatch)
    must be BIT-identical to the unfused host-gated loop: both mask the
    padded odom slots into exact no-ops (compose wraps theta, and a wrap
    of an unwrapped carry perturbs it at f32 ulp even for an identity
    delta — amplified to ~5e-5 by resampling before the mask landed)."""
    import dataclasses

    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=60, max_range=10.0),
        grid=GridConfig(height=160, width=160, resolution=0.1,
                        ray_samples=96, center_x=6.0, center_y=6.0),
        matcher=MatcherConfig(search_xy=0.2, search_theta=0.1, n_theta=7),
        chunk=8,
    )
    pf = PFConfig(n_particles=8, refine_mode="per_particle")
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0]])
    log = simulate_log(
        world, wp, cfg.sensor, step=0.2,
        odom_noise_xy=0.012, odom_noise_theta=0.006, seed=4,
    )

    pf0 = dataclasses.replace(pf, fuse_light_prefix=0)
    pf8 = dataclasses.replace(pf, fuse_light_prefix=8)
    s0, tr0, ne0, sc0 = run_fastslam(log, cfg, pf0, seed=1, host_gated=True)
    s8, tr8, ne8, sc8 = run_fastslam(log, cfg, pf8, seed=1, host_gated=True)

    np.testing.assert_array_equal(np.asarray(tr8), np.asarray(tr0))
    np.testing.assert_array_equal(np.asarray(s8.poses), np.asarray(s0.poses))
    np.testing.assert_array_equal(
        np.asarray(s8.logodds, np.float32),
        np.asarray(s0.logodds, np.float32),
    )
    np.testing.assert_array_equal(np.asarray(ne8), np.asarray(ne0))


def test_light_chunk_padded_slots_are_exact_noops():
    """make_light_chunk's padded slots (i >= n_valid, repeats of the last
    odom row) must be BIT-exact no-ops: 4 valid scans through a seg_len=16
    program == the same 4 scans through a seg_len=4 program. Before the
    padded-slot mask, se2.compose's theta wrap perturbed the carry by one
    f32 ulp per padded slot even for an identity delta."""
    from slam2d_tpu.pf.fastslam import make_light_chunk

    cfg, pf = _pf_cfg()
    P = pf.n_particles
    rng = jax.random.PRNGKey(7)
    poses = jax.random.normal(rng, (P, 3)) * jnp.asarray([1.0, 1.0, 2.0])
    log_w = jax.random.normal(jax.random.PRNGKey(8), (P,)) * 0.3
    prev = jnp.asarray([0.3, -0.2, 2.9])  # near pi: wrap-sensitive
    odom4 = prev[None, :] + jnp.asarray(
        [[0.02, 0.01, 0.35], [0.05, -0.01, 0.3], [0.07, 0.0, 0.4],
         [0.1, 0.02, 0.45]], jnp.float32
    )
    seg16 = jnp.concatenate([odom4, jnp.repeat(odom4[-1:], 12, axis=0)])

    out4 = make_light_chunk(cfg, pf, 4)(
        poses, log_w, rng, prev, jnp.float32(1.0), jnp.float32(0.5),
        jnp.float32(0.5), odom4, jnp.int32(4),
    )
    out16 = make_light_chunk(cfg, pf, 16)(
        poses, log_w, rng, prev, jnp.float32(1.0), jnp.float32(0.5),
        jnp.float32(0.5), seg16, jnp.int32(4),
    )
    # poses, rng, prev, dist, since_u, since_m must all be bit-equal
    for a, b, name in zip(
        out4[:6], out16[:6],
        ["poses", "rng", "prev", "dist", "since_u", "since_m"],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )
    np.testing.assert_array_equal(
        np.asarray(out4[6]), np.asarray(out16[6][:4]), err_msg="best poses"
    )


def test_refine_prior_weight_override():
    """refine_prior_weight (the round-5 beat-odometry constant) must land
    on BOTH prior weights of the refinement matcher; None inherits."""
    from slam2d_tpu.pf.fastslam import refine_matcher

    cfg = FrontendConfig()
    m0 = refine_matcher(cfg, PFConfig())
    assert m0.prior_xy_weight == cfg.matcher.prior_xy_weight
    m1 = refine_matcher(cfg, PFConfig(refine_prior_weight=16.0))
    assert m1.prior_xy_weight == 16.0
    assert m1.prior_theta_weight == 16.0
