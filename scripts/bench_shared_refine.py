"""Stage timing of the shared-anchor PF refinement at bench_pf shapes
(P=100, 288^2 windows): window extract+roll, blur, stack build, the big
matmul, and the whole shared_refine call.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_shared_refine.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import (
    FrontendConfig, GridConfig, MatcherConfig, PFConfig, SensorConfig,
)
from slam2d_tpu.grid.window import scan_window_cells
from slam2d_tpu.match.correlative import build_search_space
from slam2d_tpu.pf.shared_refine import (
    _global_theta_grid,
    aligned_window,
    endpoint_shift_stack,
    shared_refine,
)

P = 100


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    red = jax.jit(lambda o: jax.tree.reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, jnp.float32(0)))
    np.asarray(red(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(red(out))
    print(json.dumps({"stage": name,
                      "ms": round((time.perf_counter() - t0) / iters * 1e3, 3)}),
          flush=True)
    return out


def main():
    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=180, max_range=12.0),
        grid=GridConfig(height=512, width=512, resolution=0.1,
                        ray_samples=128, center_x=10.0, center_y=10.0),
        matcher=MatcherConfig(search_xy=0.25, search_theta=0.12, n_theta=9),
        chunk=32,
    )
    mcfg = cfg.matcher
    pf = PFConfig(n_particles=P)
    gcfg = cfg.grid
    res = gcfg.resolution
    win = scan_window_cells(gcfg, cfg.sensor, mcfg)
    r_fine = int(round(mcfg.search_xy / res))
    R = C = 2 * r_fine + 1
    G, dth_step = _global_theta_grid(mcfg, pf.refine_theta_pad)
    print(f"backend={jax.default_backend()} win={win} R={R} G={G}", flush=True)

    rng = np.random.default_rng(0)
    grids = jnp.asarray(rng.normal(0, 1.5, (P, 512, 512)).astype(np.float32))
    priors = jnp.asarray(
        np.concatenate([rng.normal(10, 2, (P, 2)), rng.normal(0, 0.05, (P, 1))],
                       axis=1).astype(np.float32))
    ranges = jnp.asarray(rng.uniform(1.0, 11.0, 180).astype(np.float32))

    def extract_roll(grids, priors):
        return jax.vmap(
            lambda g, p: aligned_window(g, p, gcfg, win)[0]
        )(grids, priors)

    gw = timeit("extract+roll x100", jax.jit(extract_roll), grids, priors)
    S = timeit("blur x100",
               jax.jit(lambda g: jax.vmap(
                   lambda x: build_search_space(x, mcfg, res))(g)), gw)
    Sp = timeit("pad+flatten+cast x100",
                jax.jit(lambda s: jnp.pad(
                    s, ((0, 0), (0, R), (0, C))).astype(jnp.bfloat16)
                    .reshape(P, -1)), S)

    def build_stack(ranges, priors):
        theta_ref = jnp.arctan2(jnp.mean(jnp.sin(priors[:, 2])),
                                jnp.mean(jnp.cos(priors[:, 2])))
        dthg = (jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0) * jnp.float32(dth_step)
        return endpoint_shift_stack(
            ranges, cfg.sensor, theta_ref + dthg, win, R, C, res, jnp.bfloat16
        )

    stack = timeit("splat+stack (shared)", jax.jit(build_stack), ranges, priors)
    timeit("big matmul [100xK]@[KxGRC]",
           jax.jit(lambda a, b: jax.lax.dot_general(
               a, b, dimension_numbers=(((1,), (1,)), ((), ())),
               preferred_element_type=jnp.float32)), Sp, stack)
    timeit("shared_refine total",
           jax.jit(lambda g, r, p: shared_refine(g, r, p, cfg, mcfg, pf)),
           grids, ranges, priors)


if __name__ == "__main__":
    main()
