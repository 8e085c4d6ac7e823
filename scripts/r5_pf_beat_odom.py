"""Round-5 PF-vs-odometry study at the MATCHED-NOISE point (VERDICT r4
item 7): the fine-res study closed the noise axis (0.004/0.002 matched
to the bench log gives ATE 0.177 vs odom 0.154) — this sweeps the axes
it left open, one at a time around that point: weight sharpness, refine
gate, refine window, refine n_theta. P=100, 0.05 m, the bench log.

Done criterion: a point with PF ATE < odom ATE on 3 seeds; its
constants go to the PFConfig docstring / bench defaults.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_pf_beat_odom.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax

from slam2d_tpu.config import (
    FrontendConfig, GridConfig, MatcherConfig, PFConfig, SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.fastslam_run import run_fastslam


def run_point(log, gt, odom_ate, *, sharp=30.0, gate=0.25, rxy=None,
              rth=None, rnth=None, seed=0, particles=100):
    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=180, max_range=12.0),
        grid=GridConfig(height=1024, width=1024, resolution=0.05,
                        ray_samples=256, center_x=10.0, center_y=10.0),
        matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=9),
        chunk=32, bootstrap_dist=2.0, match_min_motion=gate,
    )
    pf = PFConfig(
        n_particles=particles, map_dtype="bfloat16",
        noise_xy=0.004, noise_theta=0.002,      # matched to the log
        weight_sharpness=sharp,
        **({"refine_xy": rxy} if rxy is not None else {}),
        **({"refine_theta": rth} if rth is not None else {}),
        **({"refine_n_theta": rnth} if rnth is not None else {}),
    )
    run_fastslam(log, cfg, pf, seed=seed)            # compile
    t0 = time.perf_counter()
    _, traj, n_eff, _ = run_fastslam(log, cfg, pf, seed=seed)
    dt = time.perf_counter() - t0
    ate = float(ate_rmse(traj, gt, align=False))
    print(json.dumps({
        "sharp": sharp, "gate": gate, "refine_xy": rxy,
        "refine_theta": rth, "refine_n_theta": rnth, "seed": seed,
        "ate": round(ate, 3), "odom_ate": round(odom_ate, 3),
        "scans_per_sec": round(len(traj) / dt, 1),
    }), flush=True)
    return ate


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    sensor = SensorConfig(n_beams=180, max_range=12.0)
    world = SynthWorld.box_rooms(20.0)
    wp = np.array(
        [[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5],
         [17.0, 9.0], [12.0, 14.0]]
    )
    log = simulate_log(world, wp, sensor, step=0.05, seed=0)
    gt = log["gt_poses"]
    odom_ate = float(ate_rmse(log["odom"], gt, align=False))

    results = {}

    def point(**kw):
        key = tuple(sorted(kw.items()))
        results[key] = run_point(log, gt, odom_ate, **kw)

    point()                              # center: 0.177 expected
    for sharp in (60.0, 100.0):
        point(sharp=sharp)
    point(gate=0.15)
    point(rxy=0.15)                      # tighter refine window
    point(rxy=0.35)                      # wider
    point(rnth=17)                       # finer theta sampling
    point(rth=0.06)                      # tighter theta window

    best = min(results, key=results.get)
    bp = dict(best)
    print(json.dumps({"best_point": bp, "seed0_ate": results[best]}),
          flush=True)
    for seed in (1, 2):
        run_point(log, gt, odom_ate, **bp, seed=seed)


if __name__ == "__main__":
    main()
