"""Chip probe: what does the ~1.3 ms/chunk streaming overhead consist of?

The frontend device floor is 94 us/scan (6.0 ms per 64-chunk) but the
streaming loop delivers ~114 us/scan — ~1.3 ms/chunk of host-side cost.
Candidates: per-dispatch enqueue serialization over the tunnel, scaling
with the number of ARGUMENT/OUTPUT buffer handles (chunk_fn carries a
7-leaf state + 2 inputs and returns 7 + 2).

Measures dispatch-rate (device work ~nil, chained carry, sync at end) for
trivial jitted programs with the chunk_fn's buffer layout vs a packed
4-buffer layout, then the REAL chunk program both ways.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_dispatch_probe.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp


def time_dispatch(fn, carry, fixed, n=200, reps=3):
    """Chained dispatches (the first len(carry) outputs feed the next
    call's carry; `fixed` args repeat); returns best seconds/dispatch."""
    out = fn(*carry, *fixed)
    np.asarray(out[-1])
    best = float("inf")
    for _ in range(reps):
        c = list(carry)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*c, *fixed)
            c = list(out[: len(c)])
        np.asarray(out[-1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    K, B = 64, 180
    H = 1024
    big1 = jnp.zeros((H, H), jnp.float32)
    big2 = jnp.zeros((H, H), jnp.float32)
    smalls = [jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
              jnp.float32(0.0), jnp.zeros(3, jnp.float32),
              jnp.zeros(2, jnp.float32)]
    od = jnp.zeros((K, 3), jnp.float32)
    rg = jnp.zeros((K, B), jnp.float32)
    packed_small = jnp.zeros(12, jnp.float32)
    data = jnp.zeros((K, B + 3), jnp.float32)
    jax.block_until_ready(rg)

    @jax.jit
    def f9(b1, b2, s1, s2, s3, s4, s5, o, r):
        return (b1 + 1.0, b2 + 1.0, s1 + 1.0, s2 + 1.0, s3 + 1.0,
                s4 + 1.0, s5 + 1.0, o[:, 0] + r[:, 0])

    @jax.jit
    def f4(b1, b2, sv, d):
        return (b1 + 1.0, b2 + 1.0, sv + 1.0, d[:, 0] + d[:, 3])

    @jax.jit
    def f2(b1, d):
        return (b1 + 1.0, d[:, 0] + d[:, 3])

    t9 = time_dispatch(f9, (big1, big2, *smalls), (od, rg))
    t4 = time_dispatch(f4, (big1, big2, packed_small), (data,))
    t2 = time_dispatch(f2, (big1,), (data,))
    print(f"trivial dispatch: 9-arg {t9*1e3:.3f} ms | 4-arg {t4*1e3:.3f} "
          f"| 2-arg {t2*1e3:.3f}", flush=True)

    # real chunk program, standard form, for the device-work reference
    from slam2d_tpu.config import (
        FrontendConfig, GridConfig, MatcherConfig, SensorConfig,
    )
    from slam2d_tpu.data.synth import SynthWorld, simulate_log
    from slam2d_tpu.run.frontend import frontend_init, make_chunk_fn

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
    T = (len(odom) // K) * K
    n_chunks = T // K
    odl = [odom[s:s + K] for s in range(0, T, K)]
    rgl = [ranges[s:s + K] for s in range(0, T, K)]
    jax.block_until_ready(rgl[-1])

    chunk_fn = make_chunk_fn(cfg)
    best = float("inf")
    for _ in range(3):
        state = frontend_init(cfg, start_pose=odl[0][0], start_odom=odl[0][0])
        state, tr, sc = chunk_fn(state, odl[0], rgl[0])
        np.asarray(tr)
        t0 = time.perf_counter()
        for i in range(1, n_chunks):
            state, tr, sc = chunk_fn(state, odl[i], rgl[i])
        np.asarray(tr)
        best = min(best, (time.perf_counter() - t0) / (n_chunks - 1))
    print(f"real chunk (9-buffer): {best*1e3:.3f} ms/chunk "
          f"({K/best:.0f} scans/s)", flush=True)

    # host-loop-only rate: same loop with dispatch REPLACED by a no-op
    # python call, to bound the python-side list/loop cost. NOTE: must
    # not index the device arrays — r[:, 0] on a device array enqueues
    # an eager device op per chunk (the first version measured 48 ms of
    # exactly that, per CLAUDE.md's eager-op-in-host-loop rule).
    def noop(s, o, r):
        return s, o, r
    t0 = time.perf_counter()
    s = None
    for i in range(1, n_chunks):
        s, tr, sc = noop(s, odl[i], rgl[i])
    py = (time.perf_counter() - t0) / (n_chunks - 1)
    print(f"python loop body alone: {py*1e6:.1f} us/chunk", flush=True)


if __name__ == "__main__":
    main()
