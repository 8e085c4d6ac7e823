"""chunks_per_dispatch (nested-scan dispatch grouping) must be
BIT-identical to the single-chunk streaming loop — it is a pure
dispatch-structure change (FrontendConfig.chunks_per_dispatch;
round-5 dispatch decomposition in docs/COMPONENTS.md)."""

import dataclasses

import numpy as np

from slam2d_tpu.config import (
    FrontendConfig,
    GridConfig,
    MatcherConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.run.frontend import run_frontend


def _cfg(**kw):
    return FrontendConfig(
        sensor=SensorConfig(n_beams=90, max_range=12.0),
        grid=GridConfig(
            height=192, width=192, resolution=0.1, ray_samples=96,
            center_x=10.0, center_y=10.0,
        ),
        matcher=MatcherConfig(search_xy=0.2, search_theta=0.1, n_theta=7),
        chunk=16,
        **kw,
    )


def test_multichunk_bit_identical_with_tail():
    cfg1 = _cfg(chunks_per_dispatch=1)
    cfg2 = dataclasses.replace(cfg1, chunks_per_dispatch=2)
    world = SynthWorld.box_rooms(20.0)
    wp = np.array([[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5]])
    log = simulate_log(
        world, wp, cfg1.sensor, step=0.15,
        odom_noise_xy=0.01, odom_noise_theta=0.004, seed=7,
    )
    # trim so T is NOT divisible by chunk*M: exercises the odd tail
    # (partial group -> single-chunk fallback, then chunk padding)
    T = len(log["odom"])
    T2 = (T // 16) * 16 - 16 + 7
    log = {
        k: (v[:T2] if hasattr(v, "__len__") and len(v) == T else v)
        for k, v in log.items()
    }
    s1, tr1, sc1 = run_frontend(log, cfg1)
    s2, tr2, sc2 = run_frontend(log, cfg2)
    assert tr1.shape == (T2, 3)
    assert np.array_equal(tr1, tr2)
    assert np.array_equal(sc1, sc2)
    assert np.array_equal(np.asarray(s1.logodds), np.asarray(s2.logodds))
    assert np.array_equal(
        np.asarray(s1.search_space), np.asarray(s2.search_space)
    )

    # offline single-dispatch mode (nested scan-of-scans + tail pad)
    # must also be bit-identical to the streaming loop
    from slam2d_tpu.run.frontend import run_frontend_offline

    s3, tr3, sc3 = run_frontend_offline(log, cfg1)
    assert np.array_equal(tr1, tr3)
    assert np.array_equal(sc1, sc3)
    assert np.array_equal(np.asarray(s1.logodds), np.asarray(s3.logodds))
