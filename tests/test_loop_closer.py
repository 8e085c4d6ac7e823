"""Unit tests for full_slam.LoopCloser's batched async resolution: the
acceptance gates, first-accept-wins batching, the drop-vs-reissue
cooldown horizon, and sync-equivalent cooldown backdating. The device
attempt kernels and the accept tail are stubbed — the e2e behavior is
covered by tests/test_full_slam*.py; THESE tests pin the host-side
batch semantics that are easy to regress silently."""

import numpy as np

from slam2d_tpu.config import (
    FrontendConfig, GraphConfig, GridConfig, MatcherConfig, SensorConfig,
)
from slam2d_tpu.run.full_slam import (
    LoopCloser, default_loop_matcher, default_submap_grid,
)

GCFG = GraphConfig(
    max_nodes=64, max_edges=256, keyframe_dist=1.0,
    loop_min_gap=2, loop_radius=5.0, loop_cooldown=3,
    loop_score_accept=0.5, loop_min_peak_margin=0.05,
    loop_max_correction_xy=1.0, loop_max_correction_theta=0.5,
)


def make_closer(n_kf=20):
    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=8, max_range=5.0),
        grid=GridConfig(height=64, width=64, resolution=0.1),
        matcher=MatcherConfig(),
    )
    kf_poses = [np.array([0.1 * k, 0.0, 0.0], np.float32) for k in range(n_kf)]
    # defer_accept=False: these tests pin the SYNC batch semantics the
    # deferred path shares (gates, first-accept-wins, drop/reissue);
    # the deferral itself is covered by test_deferred_accept_queues_issues
    closer = LoopCloser(
        cfg, GCFG, default_loop_matcher(GCFG), default_submap_grid(cfg),
        3, None, kf_poses, [None] * n_kf, list(range(n_kf)),
        np.zeros((n_kf, 8), np.float32), np.zeros((100, 3), np.float32),
        "dense", 200.0, 0, lambda est: None, [], defer_accept=False,
    )
    accepts = []
    reissues = []
    closer._accept = lambda i, k, z, sc, est, upto: (
        accepts.append((i, k))
        or (est, closer.kf_poses[-1].copy(), np.zeros(3, np.float32))
    )
    closer.issue = lambda k_new, scan_i: reissues.append(k_new)
    return closer, accepts, reissues


def entry(k_new, score, margin=0.2, corr=(0.0, 0.0, 0.0), i=0):
    # matched_rel == prior_rel + corr so the plausibility gate sees `corr`
    prior_rel = np.array([1.0, 0.5, 0.1], np.float32)
    return {
        "i": i, "k_new": k_new, "scan_i": k_new,
        "prior_rel": prior_rel,
        "outs": (
            prior_rel + np.asarray(corr, np.float32),
            np.float32(score),
            np.float32(margin),
        ),
    }


def test_gates_reject_and_record():
    closer, accepts, _ = make_closer()
    closer.pending = [
        entry(5, score=0.2),                      # score gate
        entry(6, score=0.9, margin=0.01),         # margin gate
        entry(7, score=0.9, corr=(2.0, 0, 0)),    # xy plausibility gate
        entry(8, score=0.9, corr=(0, 0, 0.9)),    # theta plausibility gate
    ]
    cd, est, nl, _T = closer.resolve(np.zeros(3, np.float32), 50)
    assert accepts == []
    assert cd is None and nl is None
    rec = np.asarray(closer.attempt_records)
    assert rec.shape == (4, 10)
    assert (rec[:, 6] == 0.0).all()               # all recorded as rejected


def test_first_accept_wins_drop_and_reissue():
    closer, accepts, reissues = make_closer()
    closer.pending = [
        entry(10, score=0.3),                     # rejected, recorded
        entry(12, score=0.9),                     # ACCEPTED
        entry(14, score=0.9),                     # 14-12=2 <= cooldown: drop
        entry(16, score=0.9),                     # 16-12=4 > cooldown: reissue
    ]
    cd, est, nl, _T = closer.resolve(np.zeros(3, np.float32), 50)
    assert accepts == [(0, 12)]
    assert reissues == [16]
    # dropped/reissued attempts are NOT recorded (the synchronous
    # formulation never issued them at this point)
    rec = np.asarray(closer.attempt_records)
    assert list(rec[:, 1]) == [10.0, 12.0]
    assert rec[1, 6] == 1.0
    assert nl is not None
    # sync-equivalent cooldown: 19 keyframes exist after index 12 ->
    # loop_cooldown(3) - (19 - 12) floors at 0
    assert cd == max(0, GCFG.loop_cooldown - (len(closer.kf_poses) - 1 - 12))


def test_cooldown_backdating_partial():
    closer, accepts, _ = make_closer(n_kf=14)     # last keyframe index 13
    closer.pending = [entry(12, score=0.9)]
    cd, est, nl, _T = closer.resolve(np.zeros(3, np.float32), 50)
    assert accepts == [(0, 12)]
    assert cd == GCFG.loop_cooldown - 1           # one keyframe admitted since


def test_empty_pending_noop():
    closer, accepts, _ = make_closer()
    cd, est, nl, _T = closer.resolve(np.ones(3, np.float32), 50)
    assert cd is None and nl is None
    np.testing.assert_array_equal(est, np.ones(3, np.float32))


def test_deferred_accept_queues_issues():
    """defer_accept=True: an accept only DISPATCHES at its resolve; issue()
    requests made while it is in flight queue and re-issue after the
    finalize (stale priors fed the loop matcher perceptual aliases —
    round-3 finding, ATE 0.10 -> 0.52 on the parity log before this)."""
    closer, _, _ = make_closer()
    closer.defer_accept = True
    dispatched = []
    finalized = []
    issued = []
    closer._accept_dispatch = lambda i, k, z, sc: (
        dispatched.append((i, k)),
        setattr(closer, "pending_accept", {"n0": len(closer.kf_poses)}),
    )
    closer._finalize_accept = lambda est, upto: (
        finalized.append(True),
        setattr(closer, "pending_accept", None),
    ) and None or (est, closer.kf_poses[-1].copy(), np.zeros(3, np.float32))
    closer.pending = [entry(12, score=0.9)]
    cd, est, nl, T = closer.resolve(np.zeros(3, np.float32), 50)
    assert dispatched == [(0, 12)] and not finalized
    assert nl is None and T is None            # bookkeeping not landed yet
    assert cd is not None                      # cooldown set at dispatch

    # issue() while the accept is in flight must queue, not dispatch
    real_issue = type(closer).issue
    real_issue(closer, 19, 19)
    assert closer.deferred_issues == [(19, 19)]

    # next resolve finalizes, then re-issues the queued attempt
    closer.issue = lambda k, s: issued.append((k, s))
    cd, est, nl, T = closer.resolve(np.zeros(3, np.float32), 60)
    assert finalized and closer.pending_accept is None
    assert issued == [(19, 19)]
    assert nl is not None and T is not None
