"""Characterize the loop-accept operating point (VERDICT r3 item 8).

The accept gates (loop_score_accept, loop_min_peak_margin,
loop_max_correction_xy/theta) were single-scenario hand-tuned, and the
round-3 stale-prior bug (a 90-degree perceptual alias passing every
gate, ATE 0.094 -> 0.52) showed they sit near a cliff. This script picks
them from a measured precision/recall surface instead:

1. OBSERVE: run full SLAM with accepts DISABLED (loop_score_accept=9)
   over loop-dense synthetic scenarios x seeds — every attempt is
   recorded (FullSLAMResult.loop_attempts now carries the measured
   relative pose z), none feeds back, so the attempt stream is
   gate-independent.
2. LABEL: attempt (i, j, z) is TRUE iff z matches the ground-truth
   relative pose between the two keyframes' scans within a matcher-
   tolerance bound (0.25 m / 0.12 rad).
3. SWEEP: replay the driver's exact gate logic over (score x margin x
   max-correction) and print the precision/recall table. (Static
   approximation: cooldown and first-accept-wins dynamics are not
   replayed — they only THIN accepts, so precision here lower-bounds
   the live system's.)
4. VERIFY: re-run the scenarios LIVE with the chosen gates (accepts on,
   deferred — the stale-prior path) and report ATE + accepted loops,
   including an alias-stress scenario (square room revisited at high
   odometry drift — the geometry class that produced the round-3 alias).

Run (CPU, ~10 min):  python scripts/sweep_loop_gates.py [--quick]
Writes docs/LOOP_GATES.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from slam2d_tpu.config import (
    FrontendConfig, GraphConfig, GridConfig, MatcherConfig, SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.full_slam import run_full_slam

SENSOR = SensorConfig(n_beams=120, max_range=12.0)
CFG = FrontendConfig(
    sensor=SENSOR,
    grid=GridConfig(height=256, width=256, resolution=0.1, ray_samples=128,
                    center_x=10.0, center_y=10.0),
    matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
    chunk=16,
)
TOL_XY, TOL_TH = 0.25, 0.12    # truth tolerance: matcher's search quantum


def _scenarios(quick=False):
    """Loop-dense scenario family: the parity two-lap loop, a drifty
    corridor revisit, and the high-drift square (alias stress)."""
    world = SynthWorld.box_rooms(20.0)
    two_lap = np.array([
        [3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [8.0, 3.0],
        [3.0, 3.0], [3.0, 8.0], [8.0, 8.0],
    ])
    long_lap = np.array([
        [3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5],
        [17.0, 9.0], [12.0, 14.0], [9.0, 17.0], [4.0, 16.0], [3.0, 10.0],
        [3.0, 3.8], [3.0, 8.0],
    ])
    out = []
    seeds = (3, 21) if quick else (3, 21, 42)
    for s in seeds:
        out.append((f"two_lap/s{s}", world, two_lap, 0.02, 0.008, s))
        out.append((f"long_lap/s{s}", world, long_lap, 0.02, 0.008, s))
    # alias stress: small square revisited with 2x drift — symmetric
    # geometry + a badly stale prior is the round-3 alias class
    for s in seeds[:2]:
        out.append((f"square_drift/s{s}", world, two_lap, 0.04, 0.016, s))
    return out


def _np_between(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                     (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi])


def collect(quick=False):
    rows = []          # (score, margin, corr_xy, corr_th, is_true)
    for name, world, wp, nxy, nth, seed in _scenarios(quick):
        log = simulate_log(world, wp, SENSOR, step=0.18,
                           odom_noise_xy=nxy, odom_noise_theta=nth,
                           seed=seed)
        gcfg = GraphConfig(max_nodes=256, max_edges=1024,
                           loop_score_accept=9.0)   # observe-only
        res = run_full_slam(log, CFG, gcfg)
        gt = log["gt_poses"]
        att = np.asarray(res.loop_attempts)
        n_true = 0
        for a in att:
            i, j = int(a[0]), int(a[1])
            z = a[7:10]
            z_true = _np_between(gt[res.kf_scan_idx[i]],
                                 gt[res.kf_scan_idx[j]])
            dz = _np_between(z_true, z)
            ok = (np.hypot(dz[0], dz[1]) < TOL_XY
                  and abs(dz[2]) < TOL_TH)
            n_true += ok
            rows.append((a[2], a[3], a[4], a[5], ok))
        print(f"{name}: {len(att)} attempts, {n_true} true")
    return np.asarray(rows, np.float64)


def sweep(rows):
    scores = (0.35, 0.45, 0.55, 0.65)
    margins = (0.0, 0.03, 0.05, 0.08, 0.12)
    corr_xy = (1.0, 1.5, 2.5)
    corr_th = (0.4, 0.6)
    out = []
    for sc, mg, cx, ct in itertools.product(scores, margins, corr_xy,
                                            corr_th):
        acc = (
            (rows[:, 0] >= sc) & (rows[:, 1] >= mg)
            & (rows[:, 2] <= cx) & (rows[:, 3] <= ct)
        )
        tp = float((acc & (rows[:, 4] > 0)).sum())
        fp = float((acc & (rows[:, 4] == 0)).sum())
        fn = float((~acc & (rows[:, 4] > 0)).sum())
        prec = tp / max(tp + fp, 1e-9)
        rec = tp / max(tp + fn, 1e-9)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        out.append((sc, mg, cx, ct, tp, fp, fn, prec, rec, f1))
    return out


def verify_live(gates, quick=False):
    """Re-run scenarios with accepts ON at the chosen gates."""
    sc, mg, cx, ct = gates
    results = []
    for name, world, wp, nxy, nth, seed in _scenarios(quick):
        log = simulate_log(world, wp, SENSOR, step=0.18,
                           odom_noise_xy=nxy, odom_noise_theta=nth,
                           seed=seed)
        gcfg = GraphConfig(
            max_nodes=256, max_edges=1024, loop_score_accept=sc,
            loop_min_peak_margin=mg, loop_max_correction_xy=cx,
            loop_max_correction_theta=ct,
        )
        res = run_full_slam(log, CFG, gcfg)
        gt = log["gt_poses"]
        ate = float(ate_rmse(res.traj, gt, align=False))
        ate_od = float(ate_rmse(log["odom"], gt, align=False))
        results.append((name, res.n_loops, ate, ate_od))
        print(f"live {name}: loops={res.n_loops} ate={ate:.3f} "
              f"odom={ate_od:.3f}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    rows = collect(args.quick)
    table = sweep(rows)
    table.sort(key=lambda r: (-r[9], -r[7]))

    # operating point: best recall among precision == 1.0 candidates
    # (one false accept costs ~0.4 ATE — the round-3 alias; a missed
    # true loop costs only the next attempt a few keyframes later)
    perfect = [r for r in table if r[7] >= 0.999]
    chosen = max(perfect, key=lambda r: r[8]) if perfect else table[0]

    defaults = GraphConfig()
    live = verify_live(chosen[:4], args.quick)

    lines = [
        "# Loop-accept operating point (round 4, VERDICT r3 item 8)\n\n",
        "Method: see scripts/sweep_loop_gates.py (observe-mode attempt\n"
        "stream over loop-dense scenarios, GT-labeled, driver gate logic\n"
        "replayed over the grid; precision lower-bounds the live system\n"
        "since cooldown/first-accept-wins only thin accepts).\n\n",
        f"Attempts collected: {len(rows)} "
        f"({int(rows[:, 4].sum())} true, "
        f"{int((rows[:, 4] == 0).sum())} false)\n\n",
        "| score>= | margin>= | corr_xy<= | corr_th<= | TP | FP | FN |"
        " precision | recall | F1 |\n",
        "|---|---|---|---|---|---|---|---|---|---|\n",
    ]
    for r in table[:15]:
        lines.append(
            "| %.2f | %.2f | %.1f | %.1f | %d | %d | %d | %.3f | %.3f |"
            " %.3f |\n" % r
        )
    lines.append(
        "\nChosen operating point (max recall at precision 1.0): "
        "score>=%.2f, margin>=%.2f, corr_xy<=%.1f, corr_th<=%.1f "
        "(P=%.3f R=%.3f F1=%.3f)\n" % (chosen[0], chosen[1], chosen[2],
                                       chosen[3], chosen[7], chosen[8],
                                       chosen[9])
    )
    lines.append(
        "\nGraphConfig defaults at sweep time: score>=%.2f margin>=%.2f "
        "corr_xy<=%.1f corr_th<=%.1f\n"
        % (defaults.loop_score_accept, defaults.loop_min_peak_margin,
           defaults.loop_max_correction_xy,
           defaults.loop_max_correction_theta)
    )
    lines.append("\n## Live verification at the chosen gates "
                 "(accepts on, deferred)\n\n"
                 "| scenario | loops | ATE | odom ATE |\n|---|---|---|---|\n")
    for name, nl, ate, ate_od in live:
        lines.append("| %s | %d | %.3f | %.3f |\n" % (name, nl, ate, ate_od))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "LOOP_GATES.md")
    with open(out, "w") as f:
        f.writelines(lines)
    print("wrote", out)


if __name__ == "__main__":
    main()
