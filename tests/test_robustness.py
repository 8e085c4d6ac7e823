"""Driver-level robustness probes (SURVEY.md §6 edge cases).

The reference's drivers iterate plain Python lists, so odd log lengths and
hitless scans are trivially fine there; our jitted chunked `lax.scan`
drivers must prove the same via the pad path (run/frontend.py:run_frontend)
and the masked no-hit beam encoding (grid/occupancy.py).
"""

import numpy as np
import jax.numpy as jnp

from slam2d_tpu.config import (
    FrontendConfig,
    GridConfig,
    MatcherConfig,
    PFConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.run.frontend import run_frontend
from slam2d_tpu.run.fastslam_run import run_fastslam

CFG = FrontendConfig(
    sensor=SensorConfig(n_beams=60, max_range=8.0),
    grid=GridConfig(
        height=128, width=128, resolution=0.15, ray_samples=64,
        center_x=8.0, center_y=8.0,
    ),
    matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=7),
    chunk=8,
)


def _log(n=None):
    world = SynthWorld.box_rooms(16.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0]])
    log = simulate_log(
        world, wp, CFG.sensor, step=0.2,
        odom_noise_xy=0.005, odom_noise_theta=0.002, seed=3,
    )
    if n is not None:
        log = {k: v[:n] for k, v in log.items()}
    return log


def test_log_length_not_divisible_by_chunk():
    log = _log()
    T = (len(log["odom"]) // CFG.chunk - 1) * CFG.chunk + 3
    log = {k: v[:T] for k, v in log.items()}
    state, traj, scores = run_frontend(log, CFG)
    assert traj.shape == (T, 3) and scores.shape == (T,)
    assert np.isfinite(traj).all() and np.isfinite(scores).all()
    assert np.isfinite(np.asarray(state.logodds)).all()


def test_single_scan_log():
    log = _log(n=1)
    state, traj, scores = run_frontend(log, CFG)
    assert traj.shape == (1, 3)
    assert np.isfinite(traj).all()
    lo = np.asarray(state.logodds)
    assert np.isfinite(lo).all() and (lo < -0.1).any()  # scan integrated


def test_all_max_range_scans_mid_log_stay_finite():
    log = _log()
    ranges = np.array(log["ranges"], np.float32)
    # a blackout stretch: every beam returns max_range (no hits)
    ranges[10:16, :] = CFG.sensor.max_range
    log = dict(log, ranges=ranges)
    state, traj, scores = run_frontend(log, CFG)
    assert np.isfinite(traj).all() and np.isfinite(scores).all()
    assert np.isfinite(np.asarray(state.logodds)).all()
    # the pipeline recovers: post-blackout poses still track ground truth
    err = np.linalg.norm(traj[-1, :2] - log["gt_poses"][-1, :2])
    assert err < 1.0


def test_fastslam_all_max_range_stays_finite():
    log = _log(n=24)
    ranges = np.array(log["ranges"], np.float32)
    ranges[8:12, :] = CFG.sensor.max_range
    log = dict(log, ranges=ranges)
    pf_cfg = PFConfig(n_particles=8)
    _, traj, n_eff, scores = run_fastslam(log, CFG, pf_cfg)
    assert np.isfinite(np.asarray(traj)).all()
    assert np.isfinite(np.asarray(n_eff)).all()


def test_localization_robustness_probes():
    """Localize mode through the same probes: odd log length, recovery
    enabled on a log whose scans go all-max-range mid-way (scores drop to
    the no-match sentinel; recovery must not fire on unmatched chunks or
    crash on empty matched sets), and a single-scan log."""
    from slam2d_tpu.run.frontend import run_localization

    state, _, _ = run_frontend(_log(), CFG)
    prebuilt = np.asarray(state.logodds)

    # odd length
    log = _log(n=2 * CFG.chunk + 3)
    _, traj, scores, events = run_localization(log, CFG, prebuilt, recover=True)
    assert traj.shape == (len(log["odom"]), 3)
    assert np.isfinite(traj).all()

    # all-max-range scans mid-log: matcher sees no valid beams
    log = _log(n=3 * CFG.chunk)
    log["ranges"][CFG.chunk : 2 * CFG.chunk] = CFG.sensor.max_range
    _, traj, scores, events = run_localization(log, CFG, prebuilt, recover=True)
    assert np.isfinite(traj).all()

    # single scan
    log = _log(n=1)
    _, traj, scores, events = run_localization(log, CFG, prebuilt, recover=True)
    assert traj.shape == (1, 3) and np.isfinite(traj).all()
    assert events == []


def test_global_localize_degenerate_scans():
    """Whole-map relocalization must stay finite on a hitless scan (all
    max-range: zero valid beams) and on a NaN-polluted scan."""
    from slam2d_tpu.match.global_loc import global_localize

    state, _, _ = run_frontend(_log(), CFG)
    for r in (
        np.full(CFG.sensor.n_beams, CFG.sensor.max_range, np.float32),
        np.full(CFG.sensor.n_beams, np.nan, np.float32),
    ):
        pose, score = global_localize(
            state.logodds, r, CFG.grid, CFG.matcher, CFG.sensor,
            n_theta=8, theta_chunk=4,
        )
        assert np.isfinite(np.asarray(pose)).all()
        assert np.isfinite(float(score))
