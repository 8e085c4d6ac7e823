"""Benchmark: frontend scan-matching throughput (scans/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference is a pure-Python per-beam-loop correlative matcher;
it publishes no numbers (BASELINE.md). Its expected order is 0.5-2 scans/s
on CPU; vs_baseline is computed against the 1.0 scans/s midpoint estimate
(documented in BASELINE.md). The north-star target is >= 50x.

Runs on whatever backend jax selects (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import (
    FrontendConfig,
    GridConfig,
    MatcherConfig,
    SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.run.frontend import frontend_init, make_chunk_fn

REFERENCE_SCANS_PER_SEC = 1.0  # midpoint of the 0.5-2 scans/s estimate


def main():
    # CARMEN-like sensor, production-ish grid (51.2 m @ 5 cm cells).
    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=180, max_range=12.0),
        grid=GridConfig(
            height=1024, width=1024, resolution=0.05, ray_samples=256,
            center_x=10.0, center_y=10.0,
        ),
        matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
        chunk=64,
        match_min_motion=0.25,   # fine-res tuning (see FrontendConfig note)
    )

    world = SynthWorld.box_rooms(20.0)
    wp = np.array(
        [[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5],
         [17.0, 9.0], [12.0, 14.0], [9.0, 17.0], [4.0, 16.0], [3.0, 4.0]]
    )
    log = simulate_log(world, wp, cfg.sensor, step=0.05, seed=0)
    odom = jnp.asarray(log["odom"])
    ranges = jnp.asarray(log["ranges"])
    T = (len(odom) // cfg.chunk) * cfg.chunk
    n_chunks = T // cfg.chunk

    chunk_fn = make_chunk_fn(cfg)
    state = frontend_init(cfg, start_pose=odom[0], start_odom=odom[0])

    # Warmup: compile + one chunk. np.asarray forces a device->host transfer,
    # which (unlike block_until_ready on some remote backends) really drains
    # the dispatch queue before timing starts.
    state, tr, sc = chunk_fn(state, odom[: cfg.chunk], ranges[: cfg.chunk])
    np.asarray(tr)

    t0 = time.perf_counter()
    done = 0
    for i in range(1, n_chunks):
        s = i * cfg.chunk
        state, tr, sc = chunk_fn(state, odom[s : s + cfg.chunk], ranges[s : s + cfg.chunk])
        done += cfg.chunk
    np.asarray(tr)  # hard sync
    dt = time.perf_counter() - t0

    scans_per_sec = done / dt
    print(
        json.dumps(
            {
                "metric": "frontend_scans_per_sec",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
