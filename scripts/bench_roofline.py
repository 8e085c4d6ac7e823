"""Roofline / MFU ledger for the three hot kernels (VERDICT r1 item 2;
BASELINE north-star "speed-of-light per chip").

Per kernel: measured wall time, FLOPs and HBM bytes (XLA cost_analysis
where available; stated hand-count formulas for the Pallas custom calls,
which cost_analysis cannot see into), achieved TFLOP/s and GB/s, and the
percentage of the relevant v5e roof. The binding resource is the larger
fraction.

v5e peaks used (single chip):
  MXU bf16  197 TFLOP/s   (f32 operands lower; scoring runs bf16)
  HBM       819 GB/s
  VPU f32   ~3.9 TFLOP/s  ESTIMATE: 8x128 lanes x 4 ALUs x 0.94 GHz —
                          not an official figure; used only to normalize
                          the update kernel's vector-op count.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_roofline.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import (
    FrontendConfig, GridConfig, MatcherConfig, PFConfig, SensorConfig,
)

MXU_PEAK = 197e12
HBM_PEAK = 819e9
VPU_PEAK = 3.9e12   # estimate, see module docstring


def device_loop_time(step, carry0, iters=30):
    """Time `iters` sequential runs of `step` INSIDE one jitted lax.scan —
    immune to per-dispatch tunnel overhead and to bulk-fetch cost (the
    remote tunnel fetches bf16 bulk outputs at ~0.01 GB/s; only a scalar
    leaves the device here). `step(carry, t) -> carry` must thread a data
    dependency through the kernel so XLA cannot hoist it out of the loop."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(carry, n):
        def body(c, t):
            return step(c, t), ()

        out, _ = jax.lax.scan(body, carry, jnp.arange(n))
        return jax.tree.map(
            lambda x: jnp.sum(x[:1].astype(jnp.float32)), out
        )

    def run(n):
        t0 = time.perf_counter()
        chk = loop(carry0, n)
        np.asarray(jax.tree.leaves(chk)[0])  # scalar fetch = hard sync
        return time.perf_counter() - t0

    loop(carry0, 1), loop(carry0, iters)  # compile both trip counts
    run(1), run(iters)  # warm
    t1 = min(run(1) for _ in range(3))
    tn = min(run(iters) for _ in range(3))
    return (tn - t1) / (iters - 1)  # tunnel RTT + fixed overhead cancel


def report(kernel, wall_s, flops, bytes_, flop_peak, flop_kind, note=""):
    tf = flops / wall_s
    gb = bytes_ / wall_s
    pct_f = tf / flop_peak
    pct_b = gb / HBM_PEAK
    print(json.dumps({
        "kernel": kernel,
        "wall_ms": round(wall_s * 1e3, 3),
        "gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(tf / 1e12, 2),
        f"pct_{flop_kind}_peak": round(100 * pct_f, 1),
        "gbytes": round(bytes_ / 1e9, 3),
        "achieved_gbps": round(gb / 1e9, 1),
        "pct_hbm_peak": round(100 * pct_b, 1),
        "binding": flop_kind if pct_f > pct_b else "hbm",
        "note": note,
    }), flush=True)


def bench_mxu_score():
    """Frontend match scoring at bench shapes (520^2 window, 13 thetas,
    180 beams, fine R=C). FLOPs/bytes from XLA cost_analysis."""
    from slam2d_tpu.ops.mxu_score import score_offsets_mxu

    H = W = 520
    T, B = 13, 180
    R = C = 13
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.random((H, W)), jnp.float32)
    pos_row = jnp.asarray(rng.uniform(R, H - R, (T, B)), jnp.float32)
    pos_col = jnp.asarray(rng.uniform(C, W - C, (T, B)), jnp.float32)
    valid = jnp.ones((B,), bool)

    fn = jax.jit(functools.partial(score_offsets_mxu, R=R, C=C))
    lowered = fn.lower(S, pos_row, pos_col, valid)
    ca = lowered.compile().cost_analysis()
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))

    def step(c, t):
        sc = score_offsets_mxu(
            S, pos_row + (t % 2) * 1e-3, pos_col, valid, R=R, C=C
        )
        return c + jnp.sum(sc).reshape(1)

    wall = device_loop_time(step, jnp.zeros((1,), jnp.float32))
    report("mxu_score (frontend match)", wall, flops, bytes_,
           MXU_PEAK, "mxu", "flops/bytes from XLA cost_analysis")


def bench_pallas_field():
    """Fused window+blur+field at FastSLAM-100 shapes. Hand-counted
    bytes: one map-window read (aligned superset) + one field write per
    particle; the VMEM-resident chain does no other HBM traffic."""
    from slam2d_tpu.match.correlative import _gaussian_kernel_1d
    from slam2d_tpu.ops.pallas_field import fused_window_field

    P, Hm, Wm, win = 100, 512, 512, 288
    taps = tuple(float(v) for v in _gaussian_kernel_1d(1.0, 3))
    rng = np.random.default_rng(0)
    grids = jnp.asarray(
        rng.normal(size=(P, Hm, Wm)).astype(np.float32), jnp.bfloat16
    )
    origins = jnp.asarray(
        rng.integers(-8, Hm - win + 8, (P, 2)), jnp.int32
    )
    def step(c, t):
        field = fused_window_field(
            grids, origins + (t % 2), win, taps, 0.5, -0.2, 0.6,
            out_dtype=jnp.bfloat16,
        )
        return c + jnp.sum(field[0, 0, :8].astype(jnp.float32)).reshape(1)

    wall = device_loop_time(step, jnp.zeros((1,), jnp.float32))
    pad = 8
    aligned = (win + 2 * pad)
    bytes_ = P * (aligned * aligned * 2 + win * win * 2)
    # VPU work: ~len(taps)*2 shift-adds + ~10 field ops per cell
    flops = P * win * win * (2 * len(taps) + 10)
    report("pallas_field (PF refine field)", wall, flops, bytes_,
           VPU_PEAK, "vpu",
           "bytes = aligned window read + field write (hand count)")


def bench_pallas_update():
    """Dense ISM update kernel at the PF batch shape (donated in-place).
    Bytes: window read+write. VPU ops: cells x avg beam-chunk trips x
    ~12 ops x 4-beam unroll, with the trip count computed by replaying
    the kernel's angular-clip bounds on the host."""
    from slam2d_tpu.ops.pallas_update import _UNROLL, pallas_dense_update

    gcfg = GridConfig(height=288, width=288, resolution=0.1,
                      center_x=14.4, center_y=14.4, ray_samples=128)
    sensor = SensorConfig(n_beams=180, max_range=12.0)
    P = 100
    rng = np.random.default_rng(0)
    ranges = jnp.asarray(rng.uniform(1.0, 11.0, (sensor.n_beams,)),
                         jnp.float32)
    poses = jnp.asarray(
        np.tile(np.array([14.4, 14.4, 0.3], np.float32), (P, 1))
        + rng.normal(0, 0.1, (P, 3)).astype(np.float32)
    )
    maps = jnp.zeros((P, 288, 288), jnp.bfloat16)

    def step(m, t):
        return jax.vmap(
            lambda g, p: pallas_dense_update(g, p, ranges, gcfg, sensor)
        )(m, poses)

    wall = device_loop_time(step, maps, iters=10)

    bytes_ = P * 2 * 288 * 288 * 2
    # replay the clip: per [32, 128] tile, chunks in [c_lo, c_hi)
    br, bc = 32, 128
    rr = (np.arange(288) + 0.5) * gcfg.resolution + gcfg.origin_y - 14.4
    cc = (np.arange(288) + 0.5) * gcfg.resolution + gcfg.origin_x - 14.4
    cyg, cxg = np.meshgrid(rr, cc, indexing="ij")
    phi = np.arctan2(cyg, cxg) - 0.3 - sensor.angle_min
    phi = np.mod(phi + np.pi, 2 * np.pi) - np.pi
    d = np.hypot(cxg, cyg)
    step = sensor.fov_rad / (sensor.n_beams - 1)
    n_chunks_tot = 0
    B_pad = ((sensor.n_beams + _UNROLL - 1) // _UNROLL) * _UNROLL
    nch = B_pad // _UNROLL
    for i in range(288 // br):
        for j in range(288 // bc):
            pt = phi[i*br:(i+1)*br, j*bc:(j+1)*bc]
            dt_ = d[i*br:(i+1)*br, j*bc:(j+1)*bc]
            thr = max(0.5 * step, 0.75 * gcfg.resolution / max(dt_.min(), 1e-6)) + 0.25 * step
            if pt.max() - pt.min() > np.pi:
                lo, hi = 0, nch
            else:
                cspan = _UNROLL * step
                lo = int(np.clip(np.floor((pt.min() - thr) / cspan), 0, nch))
                hi = int(np.clip(np.floor((pt.max() + thr) / cspan) + 1, 0, nch))
            n_chunks_tot += max(hi - lo, 0)
    n_tiles = (288 // br) * (288 // bc)
    avg_beams = n_chunks_tot / n_tiles * _UNROLL
    flops = P * 288 * 288 * avg_beams * 12
    report("pallas_update (PF ISM kernel)", wall, flops, bytes_,
           VPU_PEAK, "vpu",
           f"avg clipped beams/tile {avg_beams:.0f} of {sensor.n_beams}; "
           "12 vector ops/beam hand count")


if __name__ == "__main__":
    bench_mxu_score()
    bench_pallas_field()
    bench_pallas_update()
