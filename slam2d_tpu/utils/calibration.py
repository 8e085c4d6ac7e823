"""Session calibration for cross-session-comparable benchmarks.

The remote-TPU tunnel's throughput varies tens of percent across sessions
(measured: FastSLAM-1000 ranged 213-327 scans/s for identical code;
VERDICT r4 weak item 5), so absolute headline numbers are only
interpretable WITH the session's characteristics attached. Every bench
emits one `session_calibration` JSON object next to its headline:

- ``tunnel_rtt_ms``: median blocking scalar round trip (dispatch + fetch)
  — the per-chunk latency floor every host-loop driver pays. ~25 ms flat
  on the remote tunnel, ~0.1 ms on local CPU.
- ``matmul_1024_bf16_us``: time for one 1024^3 bf16 matmul on the device,
  measured tunnel-free by differencing two chained-matmul programs of
  different depth (time = RTT + K * t_mm for K in {8, 40}).
- ``device``: the JAX device kind string.

Cross-session comparisons should be RATIOS at matched calibration, or
normalize host-loop-bound headlines by tunnel_rtt_ms.
"""

from __future__ import annotations

import functools
import time


@functools.lru_cache(maxsize=1)
def session_calibration(n_rtt: int = 15) -> dict:
    """Measure this session/process's tunnel RTT + device matmul time.

    Cached per process (the bench prints it once; repeated calls are
    free). Costs ~n_rtt round trips + 2 small compiles (~seconds on the
    remote tunnel, negligible next to any bench's own warmup).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]

    # --- tunnel RTT: blocking scalar round trips, median ---
    bump = jax.jit(lambda v: v + 1.0)
    y = bump(jnp.float32(0.0))
    np.asarray(y)  # compile + first sync
    ts = []
    for _ in range(n_rtt):
        t0 = time.perf_counter()
        y = bump(y)
        np.asarray(y)  # hard sync through the tunnel
        ts.append(time.perf_counter() - t0)
    rtt_ms = sorted(ts)[len(ts) // 2] * 1e3

    # --- device matmul time, tunnel-free by depth differencing ---
    def chain(k):
        def f(a):
            def body(x, _):
                return x @ a * jnp.bfloat16(1e-3), ()
            x, _ = jax.lax.scan(body, a, None, length=k)
            return jnp.float32(x[0, 0])
        return jax.jit(f)

    a = jnp.ones((1024, 1024), jnp.bfloat16)
    t_at = {}
    for k in (8, 40):
        f = chain(k)
        np.asarray(f(a))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(a))
            best = min(best, time.perf_counter() - t0)
        t_at[k] = best
    mm_us = max((t_at[40] - t_at[8]) / 32.0, 1e-9) * 1e6

    return {
        "device": getattr(dev, "device_kind", str(dev)),
        "tunnel_rtt_ms": round(rtt_ms, 2),
        "matmul_1024_bf16_us": round(mm_us, 1),
    }
