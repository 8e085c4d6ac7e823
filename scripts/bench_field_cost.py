"""Probe: full-grid build_search_space cost at accept-path shapes
(1024^2 @ 0.05 m) vs the windowed form — the accept profiler attributes
78 ms/accept to the search-space phase (scripts/bench_accept_parts.py),
while the frontend's 520^2 windowed field rebuild measures ~0.02 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_field_cost.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.config import GridConfig, MatcherConfig
from slam2d_tpu.match.correlative import build_search_space


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.sum(out))
    print(json.dumps({"stage": name,
                      "ms": round((time.perf_counter() - t0) / iters * 1e3, 3)}),
          flush=True)


def main():
    mcfg = MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13)
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)
    for n, res in ((1024, 0.05), (512, 0.1)):
        grid = jnp.asarray(rng.normal(0, 1.5, (n, n)).astype(np.float32))
        timeit(f"build_search_space {n}^2 @ {res}",
               jax.jit(lambda g, r=res: build_search_space(g, mcfg, r)),
               grid)


if __name__ == "__main__":
    main()
