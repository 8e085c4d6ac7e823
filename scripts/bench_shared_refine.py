"""Stage timing of the shared-anchor PF refinement at bench_pf shapes:
the production fused field kernel, the shared endpoint-splat shift
stack, the big scoring matmul, a CONV reformulation of stack+matmul
(XLA takes the R*C lag shifts implicitly — no materialized stack), and
the whole shared_refine call.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_shared_refine.py [--particles N]
"""

from __future__ import annotations

import argparse
import json
import math
import time

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import (
    FrontendConfig, GridConfig, MatcherConfig, PFConfig, SensorConfig,
)
from slam2d_tpu.grid.occupancy import world_to_cell
from slam2d_tpu.grid.window import blur_halo_cells, scan_window_cells
from slam2d_tpu.match.correlative import _gaussian_kernel_1d
from slam2d_tpu.ops.pallas_field import fused_window_field
from slam2d_tpu.pf.shared_refine import (
    _global_theta_grid,
    endpoint_shift_stack,
    shared_refine,
)


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100)
    args = ap.parse_args()
    P = args.particles

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
    grids = jnp.asarray(
        rng.normal(0, 1.5, (P, 512, 512)).astype(np.float32)
    ).astype(jnp.bfloat16)
    priors = jnp.asarray(
        np.concatenate([rng.normal(10, 2, (P, 2)), rng.normal(0, 0.05, (P, 1))],
                       axis=1).astype(np.float32))
    ranges = jnp.asarray(rng.uniform(1.0, 11.0, 180).astype(np.float32))

    hw = blur_halo_cells(mcfg, res)
    taps = tuple(float(v) for v in _gaussian_kernel_1d(mcfg.sigma_m / res, hw))

    def field(grids, priors):
        centers = jax.vmap(lambda pr: world_to_cell(pr[:2], gcfg))(priors)
        return fused_window_field(
            grids, centers - win // 2, win, taps,
            1.0 / mcfg.occ_evidence_sat,
            math.log(mcfg.free_threshold / (1.0 - mcfg.free_threshold)),
            mcfg.free_penalty, out_dtype=jnp.bfloat16,
        )

    Sp = timeit(f"fused field x{P}", jax.jit(field), grids, priors)
    Sp_flat = Sp.reshape(P, win * win)

    def build_stack(ranges, priors):
        theta_ref = jnp.arctan2(jnp.mean(jnp.sin(priors[:, 2])),
                                jnp.mean(jnp.cos(priors[:, 2])))
        dthg = (jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0) * jnp.float32(dth_step)
        return endpoint_shift_stack(
            ranges, cfg.sensor, theta_ref + dthg, win, R, C, res, jnp.bfloat16
        )

    stack = timeit("splat+stack (shared)", jax.jit(build_stack), ranges, priors)
    timeit(f"big matmul [{P}xK]@[Kx{G*R*C}]",
           jax.jit(lambda a, b: jax.lax.dot_general(
               a, b, dimension_numbers=(((1,), (1,)), ((), ())),
               preferred_element_type=jnp.float32)), Sp_flat, stack)

    # CONV reformulation: scores[p, g, dr, dc] = <S_p, shift_{dr,dc}(E_g)>
    # == correlation of S (padded by R-1/C-1 at the high edge... the stack
    # form shifts E DOWN/RIGHT, i.e. E[i-dr, j-dc], so the lag origin is
    # at pad (R-1, C-1) reversed): conv with E as filters, VALID padding
    # over an S padded LOW by (R-1, C-1)? Verify equivalence numerically
    # first, then time.
    from slam2d_tpu.ops.mxu_score import _endpoint_splat, _splat_inputs
    from slam2d_tpu.grid.occupancy import scan_endpoints_local
    from slam2d_tpu.core import se2

    def build_E(ranges, priors):
        theta_ref = jnp.arctan2(jnp.mean(jnp.sin(priors[:, 2])),
                                jnp.mean(jnp.cos(priors[:, 2])))
        dthg = (jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0) * jnp.float32(dth_step)
        thetas = theta_ref + dthg
        pts_local, valid = scan_endpoints_local(ranges, cfg.sensor)
        pts = se2.rotate_points(thetas, pts_local[None, :, :])
        pos_col = jnp.where(valid[None, :], pts[..., 0] / res + win // 2, 0.0)
        pos_row = jnp.where(valid[None, :], pts[..., 1] / res + win // 2, 0.0)
        r0, c0, fr, fc, okm = _splat_inputs(
            (win, win), pos_row, pos_col, valid, R, C, bilinear=True
        )
        return _endpoint_splat(win, win, r0, c0, fr, fc, okm, jnp.bfloat16)

    E = jax.jit(build_E)(ranges, priors)          # [G, win, win]

    def conv_scores(Sp, E):
        # stack[g, dr*C+dc] = E_g shifted down/right by (dr, dc):
        # <S, stack[g,l]> = sum_{ij} S[i, j] E[i-dr, j-dc]
        #                 = sum_{uv} S[u+dr, v+dc] E[u, v]
        # = VALID cross-correlation of pad_high(S, (R-1, C-1)) with E.
        lhs = jnp.pad(Sp, ((0, 0), (0, R - 1), (0, C - 1)))[:, None]
        rhs = E[:, None]                          # [G, 1, win, win]
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )                                         # [P, G, R, C]

    got = jax.jit(conv_scores)(Sp, E)
    want = jax.lax.dot_general(
        Sp_flat, stack, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(P, G, R, C)
    err = float(jnp.max(jnp.abs(got - want)))
    rel = err / max(float(jnp.max(jnp.abs(want))), 1e-9)
    print(json.dumps({"stage": "conv == stack+matmul", "max_rel": rel}),
          flush=True)
    timeit(f"conv form [{P}] (no stack build)", jax.jit(conv_scores), Sp, E)
    timeit("build E only", jax.jit(build_E), ranges, priors)

    timeit("shared_refine total",
           jax.jit(lambda g, r, p: shared_refine(g, r, p, cfg, mcfg, pf)),
           grids, ranges, priors)


if __name__ == "__main__":
    main()
