"""Micro-benchmark of the scan-integration kernels at the two hot shapes:
the frontend's single 520^2 update window and the PF's vmapped 100 x 256^2
windows.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_update.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import GridConfig, SensorConfig
from slam2d_tpu.grid.occupancy import raycast_update
from slam2d_tpu.ops.pallas_update import pallas_dense_update

SENSOR = SensorConfig(n_beams=180, max_range=12.0)


def timeit(name, fn, *args, iters=30):
    try:
        out = fn(*args)
        s = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
        np.asarray(s(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(s(out))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"stage": name, "error": repr(e)[:300]}), flush=True)


def make_inputs(H, P=None):
    rng = np.random.default_rng(0)
    cfg = GridConfig(height=H, width=H, resolution=0.1, ray_samples=128)
    ranges = jnp.asarray(
        rng.uniform(1.0, 11.0, SENSOR.n_beams), jnp.float32
    )
    if P is None:
        grid = jnp.zeros((H, H), jnp.float32)
        pose = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
    else:
        grid = jnp.zeros((P, H, H), jnp.float32)
        pose = jnp.asarray(
            rng.normal(0, 0.3, (P, 3)).astype(np.float32)
        )
    return cfg, grid, pose, ranges


def main():
    print(f"backend={jax.default_backend()}", flush=True)

    # ---- frontend shape: one 520^2 window -------------------------------
    cfg, grid, pose, ranges = make_inputs(520)
    timeit(
        "frontend sparse_mxu 520^2",
        jax.jit(
            lambda g, p, r: raycast_update(
                g, p, r, cfg, SENSOR, accumulate="mxu"
            )
        ),
        grid, pose, ranges,
    )
    for br in (8, 16, 32):
        timeit(
            f"frontend pallas-new 520^2 br={br}",
            jax.jit(
                lambda g, p, r, br=br: pallas_dense_update(
                    g, p, r, cfg, SENSOR, block_rows=br
                )
            ),
            grid, pose, ranges,
        )
    for variant in ("ray", "hybrid"):
        timeit(
            f"frontend pallas-{variant} 520^2",
            jax.jit(
                lambda g, p, r, v=variant: pallas_dense_update(
                    g, p, r, cfg, SENSOR, variant=v
                )
            ),
            grid, pose, ranges,
        )
    # ---- PF shape: vmap over 100 particles, 256^2 windows ---------------
    cfg, grids, poses, ranges = make_inputs(256, P=100)
    timeit(
        "pf sparse_mxu 100x256^2",
        jax.jit(
            lambda g, p, r: jax.vmap(
                lambda gg, pp: raycast_update(
                    gg, pp, r, cfg, SENSOR, accumulate="mxu"
                )
            )(g, p)
        ),
        grids, poses, ranges,
    )
    for br in (8, 16, 32):
        timeit(
            f"pf pallas-new 100x256^2 br={br}",
            jax.jit(
                lambda g, p, r, br=br: jax.vmap(
                    lambda gg, pp: pallas_dense_update(
                        gg, pp, r, cfg, SENSOR, block_rows=br
                    )
                )(g, p)
            ),
            grids, poses, ranges,
        )

if __name__ == "__main__":
    main()
