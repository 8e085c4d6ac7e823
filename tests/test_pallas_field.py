"""Fused window+field kernel (ops/pallas_field.py) vs the XLA chain.

The oracle is exactly what pf/shared_refine.py's per-particle `one()` does
today: aligned_window -> build_search_space, on f32 and bf16 maps, with
priors that push the window off every map edge.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam2d_tpu.config import GridConfig, MatcherConfig
from slam2d_tpu.grid.window import blur_halo_cells
from slam2d_tpu.match.correlative import _gaussian_kernel_1d, build_search_space
from slam2d_tpu.ops.pallas_field import fused_field_supported, fused_window_field
from slam2d_tpu.pf.shared_refine import aligned_window


def _oracle(grids, origins, win, gcfg, mcfg):
    # aligned_window takes the prior; reproduce it from the origin directly:
    # window[r, c] = grid[a + r, b + c], 0 outside the map.
    outs = []
    for g, (a, b) in zip(np.asarray(grids, np.float32), np.asarray(origins)):
        Hm, Wm = g.shape
        w = np.zeros((win, win), np.float32)
        r0, r1 = max(0, -a), min(win, Hm - a)
        c0, c1 = max(0, -b), min(win, Wm - b)
        if r1 > r0 and c1 > c0:
            w[r0:r1, c0:c1] = g[a + r0 : a + r1, b + c0 : b + c1]
        outs.append(
            np.asarray(
                build_search_space(jnp.asarray(w), mcfg, gcfg.resolution)
            )
        )
    return np.stack(outs)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_field_matches_xla_chain(dtype):
    key = jax.random.PRNGKey(0)
    P, Hm, Wm, win = 5, 128, 256, 96
    gcfg = GridConfig(height=Hm, width=Wm, resolution=0.1)
    mcfg = MatcherConfig(sigma_m=0.1)
    grids = (
        jax.random.uniform(key, (P, Hm, Wm), minval=-4.0, maxval=4.0)
    ).astype(dtype)
    # origins: interior, off top-left, off bottom-right, half-off, far corner
    origins = jnp.asarray(
        [[10, 50], [-20, -30], [Hm - 40, Wm - 40], [Hm - win // 2, 5], [-90, Wm - 8]],
        jnp.int32,
    )
    hw = blur_halo_cells(mcfg, gcfg.resolution)
    taps = tuple(float(v) for v in _gaussian_kernel_1d(mcfg.sigma_m / gcfg.resolution, hw))
    pad = max(8, ((hw + 7) // 8) * 8)
    assert fused_field_supported(Hm, Wm, win, pad)
    got = fused_window_field(
        grids,
        origins,
        win,
        taps,
        1.0 / mcfg.occ_evidence_sat,
        math.log(mcfg.free_threshold / (1.0 - mcfg.free_threshold)),
        mcfg.free_penalty,
        out_dtype=jnp.float32,
        interpret=jax.default_backend() != "tpu",
    )
    # oracle consumes the f32 view of the same maps (the kernel converts
    # bf16 once up front; the XLA chain's mixed bf16 elementwise steps only
    # differ by rounding measure-zero threshold cases)
    want = _oracle(grids.astype(jnp.float32), origins, win, gcfg, mcfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6, rtol=1e-5)


def test_aligned_window_origin_semantics():
    """aligned_window == direct unclamped extraction with zero fill (the
    contract the fused kernel implements)."""
    gcfg = GridConfig(height=64, width=128, resolution=0.1)
    g = jax.random.uniform(jax.random.PRNGKey(1), (64, 128))
    win = 32
    for prior_xy in [(1.0, 0.5), (0.2, 0.1), (12.0, 6.0)]:
        prior = jnp.asarray([prior_xy[0], prior_xy[1], 0.0])
        gw, _ = aligned_window(g, prior, gcfg, win)
        from slam2d_tpu.grid.occupancy import world_to_cell

        center = np.asarray(world_to_cell(prior[:2], gcfg))
        a, b = int(center[0]) - win // 2, int(center[1]) - win // 2
        want = np.zeros((win, win), np.float32)
        r0, r1 = max(0, -a), min(win, 64 - a)
        c0, c1 = max(0, -b), min(win, 128 - b)
        if r1 > r0 and c1 > c0:
            want[r0:r1, c0:c1] = np.asarray(g)[a + r0 : a + r1, b + c0 : b + c1]
        np.testing.assert_allclose(np.asarray(gw), want)
