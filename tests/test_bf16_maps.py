"""bf16 per-particle maps: pipeline runs and tracks comparably to f32."""

import dataclasses

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
from slam2d_tpu.run.fastslam_run import run_fastslam


def test_bf16_maps_track_like_f32():
    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=60, max_range=10.0),
        grid=GridConfig(height=192, width=192, resolution=0.1,
                        ray_samples=96, center_x=6.0, center_y=6.0),
        matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=9),
        chunk=8,
        bootstrap_dist=1.5,
    )
    pf32 = PFConfig(n_particles=8, noise_xy=0.02, noise_theta=0.01)
    pf16 = dataclasses.replace(pf32, map_dtype="bfloat16")

    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0]])
    log = simulate_log(world, wp, cfg.sensor, step=0.2,
                       odom_noise_xy=0.012, odom_noise_theta=0.006, seed=11)

    s32, t32, _, _ = run_fastslam(log, cfg, pf32, seed=0)
    s16, t16, _, _ = run_fastslam(log, cfg, pf16, seed=0)

    assert str(s16.logodds.dtype) == "bfloat16"
    assert np.isfinite(t16).all()
    gt = log["gt_poses"]
    a32 = ate_rmse(t32, gt, align=False)
    a16 = ate_rmse(t16, gt, align=False)
    # bf16 tracking within 50% of f32's error (same RNG stream)
    assert a16 < max(1.5 * a32, 0.35)
