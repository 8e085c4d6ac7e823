"""Animation export (SURVEY.md §3 visualization row: "PNG/video renderer";
the reference's defining output is a per-scan map-build animation)."""

import numpy as np

from slam2d_tpu.config import (
    FrontendConfig, GridConfig, MatcherConfig, PFConfig, SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.run.frontend import run_frontend
from slam2d_tpu.viz.video import VideoRecorder, compose_frame

CFG = FrontendConfig(
    sensor=SensorConfig(n_beams=60, max_range=10.0),
    grid=GridConfig(height=160, width=160, resolution=0.1,
                    ray_samples=96, center_x=6.0, center_y=6.0),
    matcher=MatcherConfig(search_xy=0.2, search_theta=0.1, n_theta=7),
    chunk=16,
)


def _log():
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0]])
    return simulate_log(world, wp, CFG.sensor, step=0.2, seed=4)


def test_compose_frame_shapes_and_overlays():
    logodds = np.zeros((160, 160), np.float32)
    logodds[40:43, 30:90] = 5.0  # a wall
    traj = np.stack([
        np.linspace(2.0, 6.0, 12),
        np.full(12, 3.0),
        np.zeros(12),
    ], axis=1).astype(np.float32)
    img = compose_frame(logodds, CFG.grid, traj=traj, max_dim=640)
    assert img.shape == (160, 160, 3) and img.dtype == np.uint8
    # wall cells dark, free background light
    assert img[..., 0].min() < 80 and img[..., 0].max() > 200
    # trajectory pixels are red (R >> G); the LAST point is overdrawn by
    # the blue pose marker, the rest stay red
    red = (img[..., 0].astype(int) - img[..., 1].astype(int)) > 100
    assert red.sum() >= 5
    blue = (img[..., 2].astype(int) - img[..., 1].astype(int)) > 100
    assert blue.sum() >= 4
    # downsampling kicks in above max_dim
    img2 = compose_frame(logodds, CFG.grid, max_dim=80)
    assert img2.shape == (80, 80, 3)


def test_frontend_gif_export(tmp_path):
    log = _log()
    rec = VideoRecorder(
        str(tmp_path / "run.gif"), CFG.grid, fps=5, every=2
    )
    rec.set_ground_truth(log["gt_poses"])
    _, traj, _ = run_frontend(log, CFG, frame_cb=rec.add)
    n_chunks = -(-len(log["odom"]) // CFG.chunk)
    assert len(rec.frames) == -(-n_chunks // 2)
    path = rec.save()
    assert path.endswith(".gif")
    from PIL import Image

    with Image.open(path) as im:
        assert im.is_animated and im.n_frames == len(rec.frames)


def test_mp4_export_or_gif_fallback(tmp_path):
    rec = VideoRecorder(str(tmp_path / "run.mp4"), CFG.grid, fps=5)
    logodds = np.zeros((160, 160), np.float32)
    for i in range(3):
        logodds[40 + i, 30:90] = 5.0
        rec.add(logodds, np.array([[3.0 + i, 3.0, 0.0]], np.float32))
    path = rec.save()
    assert path.endswith((".mp4", ".gif"))
    import os

    assert os.path.getsize(path) > 0


def test_fastslam_video_hook(tmp_path):
    from slam2d_tpu.run.fastslam_run import run_fastslam

    log = _log()
    rec = VideoRecorder(str(tmp_path / "pf.gif"), CFG.grid, fps=5)
    pf = PFConfig(n_particles=4, refine_mode="per_particle")
    run_fastslam(log, CFG, pf, seed=0, frame_cb=rec.add)
    # host-gated dispatch emits frames at >= chunk-row boundaries (a light
    # segment can overshoot), plus a tail flush — allow +-1 of ceil(T/K)
    expect = -(-len(log["odom"]) // CFG.chunk)
    assert abs(len(rec.frames) - expect) <= 1, (len(rec.frames), expect)
    rec.save()
