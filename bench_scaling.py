"""Weak-scaling benchmark for the device-sharded FastSLAM (BASELINE metric:
"scaling efficiency 1 -> N").

Weak scaling: particles per device held constant while the device count
grows; ideal efficiency keeps scans/s flat as the collectives (psum weight
normalization, all_gather CDF, ring map exchange) absorb the extra width.

With no multi-chip hardware attached this runs on a virtual CPU mesh
(--devices N sets xla_force_host_platform_device_count) — the collective
GRAPH is identical to the ICI/DCN lowering on a pod slice, so this validates
the scaling structure; absolute numbers come from pod runs.

Prints one JSON line per mesh size plus a summary line with the efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--particles-per-device", type=int, default=8)
    ap.add_argument("--grid", type=int, default=192)
    ap.add_argument("--scans", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend with a virtual device mesh")
    args = ap.parse_args()

    if args.cpu or True:  # only CPU meshes are available in this environment
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()

    import jax

    # Force the CPU backend BEFORE any device query (this environment's
    # sitecustomize pins jax_platforms to a remote single-chip backend).
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from slam2d_tpu.config import (
        FrontendConfig, GridConfig, MatcherConfig, PFConfig, SensorConfig,
    )
    from slam2d_tpu.data.synth import SynthWorld, simulate_log
    from slam2d_tpu.parallel.mesh import make_particle_mesh
    from slam2d_tpu.pf.sharded import make_sharded_chunk_fn, sharded_fastslam_init

    cfg = FrontendConfig(
        sensor=SensorConfig(n_beams=90, max_range=10.0),
        grid=GridConfig(
            height=args.grid, width=args.grid, resolution=0.1,
            ray_samples=96, center_x=6.0, center_y=6.0,
        ),
        matcher=MatcherConfig(search_xy=0.2, search_theta=0.1, n_theta=7),
        chunk=16,
        bootstrap_dist=1.0,
    )
    world = SynthWorld.box_rooms(12.0)
    wp = np.array([[3.0, 3.0], [3.0, 9.0], [9.0, 9.0], [9.0, 3.5], [3.5, 3.0]])
    log = simulate_log(world, wp, cfg.sensor, step=0.1, seed=0)
    odom = np.asarray(log["odom"], np.float32)
    ranges = np.asarray(log["ranges"], np.float32)
    T = min(args.scans, (len(odom) // cfg.chunk) * cfg.chunk)

    rates = {}
    for n in args.devices:
        pf = PFConfig(n_particles=args.particles_per_device * n)
        mesh = make_particle_mesh(n)
        state = sharded_fastslam_init(
            cfg, pf, jax.random.PRNGKey(0), mesh, start_pose=odom[0]
        )
        state = state._replace(prev_odom=jnp.asarray(odom[0]))
        chunk_fn = make_sharded_chunk_fn(cfg, pf, mesh)

        # warmup chunk (compile)
        state, out = chunk_fn(
            state, jnp.asarray(odom[: cfg.chunk]), jnp.asarray(ranges[: cfg.chunk])
        )
        np.asarray(out[0])

        t0 = time.perf_counter()
        done = 0
        for s in range(cfg.chunk, T, cfg.chunk):
            state, out = chunk_fn(
                state,
                jnp.asarray(odom[s : s + cfg.chunk]),
                jnp.asarray(ranges[s : s + cfg.chunk]),
            )
            done += cfg.chunk
        np.asarray(out[0])
        dt = time.perf_counter() - t0
        rates[n] = done / dt
        print(
            json.dumps(
                {
                    "metric": "sharded_pf_scans_per_sec",
                    "devices": n,
                    "particles": pf.n_particles,
                    "value": round(rates[n], 2),
                    "unit": "scans/s",
                }
            )
        )

    base = args.devices[0]
    eff = rates[max(args.devices)] / rates[base]
    print(
        json.dumps(
            {
                "metric": "weak_scaling_efficiency",
                "value": round(eff, 3),
                "unit": f"x{base}->{max(args.devices)}dev",
                "vs_baseline": round(eff / 0.8, 3),  # target >= 0.8
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
