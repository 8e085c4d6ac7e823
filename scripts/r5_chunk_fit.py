"""Chip probe 2 for the frontend dispatch overhead (VERDICT r4 item 1).

Part A — fit wall/dispatch = a + b*K for the REAL chunk program chained
back-to-back (fixed inputs), K in {16, 64, 128}: `a` is the real
program's per-dispatch overhead (the trivial-program floor measured
0.27-0.30 ms; the streaming gap implies ~1.3 ms — is overhead
program-complexity-dependent?).

Part B — scan-of-scans: one dispatch runs M chunks of 64 via an OUTER
lax.scan over an inner 64-trip scan. The chunk=128/256 and offline
experiments showed per-iteration device cost GROWS with scan trip count
(~30% by kilo-trips), so flat bigger chunks lose; nesting keeps the
inner trip count at the sweet spot while amortizing the per-dispatch
overhead over M*64 scans. Streams the real bench log for M in {1, 2, 4}
interleaved.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_chunk_fit.py
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import (
    FrontendConfig, GridConfig, MatcherConfig, SensorConfig,
)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.run.frontend import (
    frontend_init,
    make_chunk_fn,
    make_multichunk_fn,  # the production nested-scan program (no copy:
                         # a drifted duplicate would make the M-sweep
                         # numbers incomparable to bench.py's)
)


def main():
    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=180, max_range=12.0),
        grid=GridConfig(height=1024, width=1024, resolution=0.05,
                        ray_samples=256, center_x=10.0, center_y=10.0),
        matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
        chunk=64, match_min_motion=0.25,
    )
    world = SynthWorld.box_rooms(20.0)
    wp = np.array(
        [[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5], [16.0, 3.5],
         [17.0, 9.0], [12.0, 14.0], [9.0, 17.0], [4.0, 16.0], [3.0, 4.0]]
    )
    log = simulate_log(world, wp, cfg.sensor, step=0.05, seed=0)
    odom = jnp.asarray(log["odom"])
    ranges = jnp.asarray(log["ranges"])

    # ---- Part A: a + b*K fit on chained fixed-input dispatches ----------
    for K in (16, 64, 128):
        cfgK = dataclasses.replace(cfg, chunk=K)
        fnK = make_chunk_fn(cfgK)
        o = odom[100:100 + K]
        r = ranges[100:100 + K]
        state = frontend_init(cfg, start_pose=odom[100], start_odom=odom[100])
        state, tr, sc = fnK(state, o, r)
        np.asarray(tr)
        best = float("inf")
        n = 40
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                state, tr, sc = fnK(state, o, r)
            np.asarray(tr)
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"A: K={K:4d} wall/dispatch {best*1e3:.3f} ms "
              f"({best/K*1e6:.1f} us/scan)", flush=True)

    # ---- Part B: streaming over the real log, M chunks per dispatch -----
    K = 64

    def stream(M, reps=3):
        T = (len(odom) // (M * K)) * (M * K)
        groups = T // (M * K)
        od = [odom[s:s + M * K].reshape(M, K, 3)
              for s in range(0, T, M * K)]
        rg = [ranges[s:s + M * K].reshape(M, K, -1)
              for s in range(0, T, M * K)]
        jax.block_until_ready(rg[-1])
        fn = make_multichunk_fn(cfg) if M > 1 else None
        best = float("inf")
        for _ in range(reps):
            state = frontend_init(cfg, start_pose=odom[0],
                                  start_odom=odom[0])
            if M == 1:
                f1 = make_chunk_fn(cfg)
                state, tr, sc = f1(state, od[0][0], rg[0][0])
            else:
                state, tr, sc = fn(state, od[0], rg[0])
            np.asarray(tr)
            t0 = time.perf_counter()
            for i in range(1, groups):
                if M == 1:
                    state, tr, sc = f1(state, od[i][0], rg[i][0])
                else:
                    state, tr, sc = fn(state, od[i], rg[i])
            np.asarray(tr)
            dt = time.perf_counter() - t0
            best = min(best, dt / ((groups - 1) * M * K))
        return 1.0 / best

    res = {}
    for p in range(2):
        for M in (1, 2, 4):
            sps = stream(M)
            res.setdefault(M, []).append(sps)
            print(f"B: pass {p} M={M}: {sps:.1f} scans/s", flush=True)
    for M in (1, 2, 4):
        print(f"B best M={M}: {max(res[M]):.1f} scans/s")


if __name__ == "__main__":
    main()
