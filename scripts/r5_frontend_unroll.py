"""Chip A/B: lax.scan unroll factor x chunk size for the frontend loop.

Motivation (round 5): the offline single-dispatch experiment measured the
whole-log scan program ~30% SLOWER per scan than the 64-chunk streaming
loop — i.e. long scan programs carry per-iteration overhead. If unrolling
removes it, LARGER chunks stop losing, and fewer per-chunk dispatch
enqueues (~1.5 ms each over the tunnel) should close part of the
8.6k -> 10.6k scans/s gap (VERDICT r4 item 1).

Protocol per CLAUDE.md: min-of-N timing, hard sync via np.asarray, two
interleaved passes over all configs (tunnel drift), one TPU process.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_frontend_unroll.py
"""

from __future__ import annotations

import dataclasses
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


def bench_cfg(base, log, chunk, unroll, reps=3):
    cfg = dataclasses.replace(base, chunk=chunk, scan_unroll=unroll)
    odom = jnp.asarray(log["odom"])
    ranges = jnp.asarray(log["ranges"])
    T = (len(odom) // chunk) * chunk
    n_chunks = T // chunk
    od = [odom[s : s + chunk] for s in range(0, T, chunk)]
    rg = [ranges[s : s + chunk] for s in range(0, T, chunk)]
    jax.block_until_ready(rg[-1])
    chunk_fn = make_chunk_fn(cfg)

    best = float("inf")
    for _ in range(reps):
        state = frontend_init(cfg, start_pose=od[0][0], start_odom=od[0][0])
        state, tr, sc = chunk_fn(state, od[0], rg[0])  # compile/warm
        np.asarray(tr)
        t0 = time.perf_counter()
        done = 0
        for i in range(1, n_chunks):
            state, tr, sc = chunk_fn(state, od[i], rg[i])
            done += chunk
        np.asarray(tr)
        dt = time.perf_counter() - t0
        best = min(best, dt / done)
    return 1.0 / best  # scans/s


def main():
    base = FrontendConfig(
        sensor=SensorConfig(n_beams=180, max_range=12.0),
        grid=GridConfig(
            height=1024, width=1024, resolution=0.05, ray_samples=256,
            center_x=10.0, center_y=10.0,
        ),
        matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
        match_min_motion=0.25,
    )
    world = SynthWorld.box_rooms(20.0)
    wp = np.array(
        [[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5],
         [17.0, 9.0], [12.0, 14.0], [9.0, 17.0], [4.0, 16.0], [3.0, 4.0]]
    )
    log = simulate_log(world, wp, base.sensor, step=0.05, seed=0)

    configs = [(64, 1), (64, 2), (64, 4), (128, 4), (256, 4), (256, 8)]
    results = {c: [] for c in configs}
    for p in range(2):  # two interleaved passes
        for c in configs:
            sps = bench_cfg(base, log, *c)
            results[c].append(sps)
            print(f"pass {p} chunk={c[0]} unroll={c[1]}: "
                  f"{sps:.1f} scans/s", flush=True)
    print("--- best of both passes ---")
    for c in configs:
        print(f"chunk={c[0]:4d} unroll={c[1]}: {max(results[c]):.1f} scans/s")


if __name__ == "__main__":
    main()
