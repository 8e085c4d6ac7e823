"""Aux subsystems: viz render, checkpoint/resume, CLI, profiling, loaders."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import FrontendConfig, GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.run.frontend import frontend_init
from slam2d_tpu.utils.checkpoint import load_state, save_state
from slam2d_tpu.utils.profiling import PhaseTimer, Throughput


def _cfg():
    return FrontendConfig(
        sensor=SensorConfig(n_beams=30, max_range=8.0),
        grid=GridConfig(height=64, width=64, resolution=0.1, ray_samples=32),
        matcher=MatcherConfig(search_xy=0.2, search_theta=0.1, n_theta=5),
    )


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    state = frontend_init(cfg, start_pose=jnp.asarray([1.0, 2.0, 0.3]))
    state = state._replace(dist=jnp.float32(4.5))
    p = save_state(str(tmp_path / "ckpt"), state)
    restored = load_state(p, frontend_init(cfg))
    np.testing.assert_allclose(np.asarray(restored.pose), [1.0, 2.0, 0.3], atol=1e-6)
    np.testing.assert_allclose(float(restored.dist), 4.5)
    assert restored.logodds.shape == state.logodds.shape


def test_render_map(tmp_path):
    from slam2d_tpu.viz import save_map_png

    cfg = _cfg()
    state = frontend_init(cfg)
    traj = np.zeros((5, 3), np.float32)
    out = save_map_png(
        str(tmp_path / "m.png"), state.logodds, cfg.grid, traj=traj, title="t"
    )
    assert os.path.getsize(out) > 1000


def test_profiling_utils():
    pt = PhaseTimer()
    with pt.phase("a"):
        pass
    with pt.phase("a"):
        pass
    assert "a" in pt.report()
    th = Throughput()
    th.mark_synced(10)
    assert th.scans_per_sec >= 0.0


def test_carmen_loader(tmp_path):
    from slam2d_tpu.data import load_carmen_log

    line = (
        "FLASER 4 1.0 2.0 3.0 4.0 0.5 0.6 0.1 0.55 0.65 0.12 ts host lts\n"
    )
    f = tmp_path / "x.clf"
    f.write_text("# comment\nODOM 0 0 0 0 0 0 ts host lts\n" + line)
    log = load_carmen_log(str(f))
    assert log["ranges"].shape == (1, 4)
    np.testing.assert_allclose(log["odom"][0], [0.55, 0.65, 0.12], atol=1e-6)


def test_json_loader(tmp_path):
    from slam2d_tpu.data import load_json_log

    records = [
        {"x": 0.0, "y": 0.0, "theta": 0.0, "range": [1.0, 2.0]},
        {"x": 0.1, "y": 0.0, "theta": 0.0, "range": [1.1, 2.1]},
    ]
    f = tmp_path / "log.json"
    f.write_text(json.dumps(records))
    log = load_json_log(str(f))
    assert log["ranges"].shape == (2, 2)
    # dict-keyed variant
    f2 = tmp_path / "log2.json"
    f2.write_text(json.dumps({"10.5": records[0], "11.5": records[1]}))
    log2 = load_json_log(str(f2))
    assert log2["odom"].shape == (2, 3)


def _run_cli(args, tmp_path, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "-m", "slam2d_tpu.run.cli", *args],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_fastslam_synth(tmp_path):
    metrics = _run_cli(
        ["--mode", "fastslam", "--log", "synth", "--grid-size", "256",
         "--resolution", "0.1", "--chunk", "16", "--particles", "8",
         "--gt-ate"],
        tmp_path,
    )
    assert metrics["mode"] == "fastslam"
    assert metrics["scans"] > 100
    assert 1.0 <= metrics["mean_n_eff"] <= 8.01
    assert np.isfinite(metrics["ate_m"])


def test_cli_full_synth(tmp_path):
    metrics = _run_cli(
        ["--mode", "full", "--log", "synth", "--grid-size", "384",
         "--resolution", "0.1", "--chunk", "16"],
        tmp_path,
    )
    assert metrics["mode"] == "full"
    assert metrics["n_keyframes"] > 10


def test_cli_frontend_synth(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    out = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "-m", "slam2d_tpu.run.cli",
            "--mode", "frontend", "--log", "synth",
            "--grid-size", "384", "--resolution", "0.1",
            "--chunk", "16", "--gt-ate", "--out", str(out), "--save-viz",
        ],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["mode"] == "frontend"
    assert metrics["scans"] > 100
    assert metrics["ate_m"] < metrics["ate_odom_m"] * 1.5
    assert (out / "map.png").exists()
    assert (out / "trajectory.npy").exists()


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp

    from slam2d_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    # a profile directory with at least one trace artifact appears
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files)


def test_carmen_writers_roundtrip(tmp_path):
    """save_carmen_log / save_json_log / carmen_to_json round-trip a
    synthetic log through both on-disk formats."""
    import numpy as np

    from slam2d_tpu.data.carmen import (
        carmen_to_json,
        load_carmen_log,
        load_json_log,
        save_carmen_log,
    )

    rng = np.random.default_rng(3)
    log = {
        "odom": rng.normal(size=(12, 3)).astype(np.float32),
        "ranges": rng.uniform(0.3, 11.0, (12, 30)).astype(np.float32),
    }
    clf = str(tmp_path / "synth.clf")
    save_carmen_log(clf, log)
    back = load_carmen_log(clf)
    np.testing.assert_allclose(back["odom"], log["odom"], atol=1e-5)
    np.testing.assert_allclose(back["ranges"], log["ranges"], atol=1e-5)

    js = str(tmp_path / "synth.json")
    carmen_to_json(clf, js)
    back2 = load_json_log(js)
    np.testing.assert_allclose(back2["odom"], log["odom"], atol=1e-5)
    np.testing.assert_allclose(back2["ranges"], log["ranges"], atol=1e-5)
