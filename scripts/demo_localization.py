"""Generate docs/example_localization.png: localization-only tracking on
a prebuilt map through a mid-log KIDNAP (two traversals spliced with a
continuous — lying — odometry frame), with score-collapse recovery
re-locking the pose via whole-map FFT relocalization.

Run (CPU is fine): python scripts/demo_localization.py
"""

from __future__ import annotations

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.run.frontend import run_frontend, run_localization

CFG = FrontendConfig(
    sensor=SensorConfig(n_beams=120, max_range=10.0),
    grid=GridConfig(height=256, width=256, resolution=0.1, ray_samples=128,
                    center_x=10.0, center_y=10.0),
    matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
    chunk=16,
)


def main():
    world = SynthWorld.box_rooms(20.0)
    map_log = simulate_log(
        world,
        np.array([[3, 3], [3, 8], [8, 8], [12, 3.5], [16, 3.5],
                  [17, 9], [12, 14], [9, 17], [4, 16]], float),
        CFG.sensor, step=0.15, odom_noise_xy=0.005, odom_noise_theta=0.002,
        seed=1,
    )
    state, _, _ = run_frontend(map_log, CFG)
    prebuilt = np.asarray(state.logodds)

    a = simulate_log(world, np.array([[3, 3], [3, 8], [7, 8]], float),
                     CFG.sensor, step=0.15, seed=3)
    b = simulate_log(world, np.array([[16, 3.5], [16.5, 8.5], [12.5, 13.5]],
                                     float),
                     CFG.sensor, step=0.15, seed=4)
    from slam2d_tpu.data.synth import splice_odom

    log = {
        "odom": np.concatenate([a["odom"], splice_odom(a["odom"], b["odom"])]),
        "ranges": np.concatenate([a["ranges"], b["ranges"]]),
        "gt_poses": np.concatenate([a["gt_poses"], b["gt_poses"]]),
    }
    _, traj, scores, events = run_localization(log, CFG, prebuilt, recover=True)
    print("recoveries:", events)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from slam2d_tpu.grid.occupancy import occupancy_prob

    p = np.asarray(occupancy_prob(prebuilt))
    g = CFG.grid
    extent = (g.origin_x, g.origin_x + 256 * g.resolution,
              g.origin_y, g.origin_y + 256 * g.resolution)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(1 - p, cmap="gray", origin="lower", extent=extent,
              vmin=0, vmax=1)
    gt = log["gt_poses"]
    Ta = len(a["odom"])
    ax.plot(gt[:, 0], gt[:, 1], "g-", lw=1.2, label="ground truth")
    ax.plot(traj[:Ta, 0], traj[:Ta, 1], "r-", lw=1.0,
            label="localized (pre-kidnap)")
    ax.plot(traj[Ta:, 0], traj[Ta:, 1], "m-", lw=1.0,
            label="localized (post-kidnap)")
    ax.plot([gt[Ta - 1, 0], gt[Ta, 0]], [gt[Ta - 1, 1], gt[Ta, 1]],
            "k--", lw=0.8, label="kidnap teleport")
    for e in events:
        ax.plot(e["pose"][0], e["pose"][1], "b*", ms=16,
                label=f"recovery @ scan {e['scan']} (score {e['score']})")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title("Localization on a prebuilt map with kidnapped-robot "
                 "recovery\n(score collapse -> whole-map FFT relocalization)")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "example_localization.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
