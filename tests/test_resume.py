"""Checkpoint/resume mid-log: split run == single run (frontend)."""

import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.run.frontend import frontend_init, run_frontend
from slam2d_tpu.utils.checkpoint import load_state, save_state


def test_split_run_matches_single_run(tmp_path):
    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=60, max_range=10.0),
        grid=GridConfig(height=192, width=192, resolution=0.1,
                        ray_samples=96, center_x=6.0, center_y=6.0),
        matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=9),
        chunk=8,
        bootstrap_dist=1.0,
    )
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0]])
    log = simulate_log(world, wp, cfg.sensor, step=0.2, seed=4)
    T = len(log["odom"])
    cut = (T // 2 // cfg.chunk) * cfg.chunk  # chunk-aligned split

    # single run
    _, traj_full, _ = run_frontend(log, cfg)

    # split run with checkpoint in the middle
    first = {k: v[:cut] for k, v in log.items()}
    second = {k: v[cut:] for k, v in log.items()}
    state, traj_a, _ = run_frontend(first, cfg)
    path = save_state(str(tmp_path / "ck"), state)
    restored = load_state(path, frontend_init(cfg))
    _, traj_b, _ = run_frontend(second, cfg, state=restored)

    traj_split = np.concatenate([traj_a, traj_b])
    np.testing.assert_allclose(traj_split, traj_full, atol=1e-4)
