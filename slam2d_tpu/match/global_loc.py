"""Global relocalization ("kidnapped robot"): find the robot's pose in a
prebuilt map with NO prior, by scoring one scan over EVERY pose.

For a fixed heading theta, the correlative score over all translations is
exactly a full-map cross-correlation between the blurred likelihood field
S and the scan's endpoint-splat image E_theta:

    score(v, theta) = sum_i S[v + e_i(theta)] = (S ★ E_theta)[v - center]

so the whole (x, y) sweep for one theta costs two FFTs and a pointwise
product — O(HW log HW) instead of the O(HW * beams) brute force the
reference's formulation would need per candidate. A full-circle theta grid
(default 72 x 5 deg) is swept in lax.map chunks, the global argmax seeds
`match_scan` for a sub-cell/sub-degree refinement.

This is the AMCL global-init analog, and pairs with run_localization
(run/frontend.py) which needs a starting pose estimate.

Caveats: FFT correlation wraps at map borders — poses whose scan would
read across the border can alias; real maps keep walls inside the border
so the true peak dominates in practice (tests place the robot anywhere in
a 20 m world on a 256^2 map). Scores are normalized per valid beam, same
scale as match_scan's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.grid.occupancy import scan_endpoints_local
from slam2d_tpu.match.correlative import build_search_space, match_scan


def _endpoint_image(pts, valid, theta, H, W, resolution):
    """Bilinear endpoint splat around the image CENTER cell for one
    heading. One-shot op (not the hot path), so the scatter-add is fine."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    ex = (c * pts[:, 0] - s * pts[:, 1]) / resolution + (W // 2)
    ey = (s * pts[:, 0] + c * pts[:, 1]) / resolution + (H // 2)
    # invalid beams carry NaN coordinates; their weight is 0 but
    # 0 * NaN = NaN would poison the whole splat (same guard as
    # correlative.score_offsets)
    ex = jnp.where(valid, ex, 0.0)
    ey = jnp.where(valid, ey, 0.0)
    x0 = jnp.floor(ex).astype(jnp.int32)
    y0 = jnp.floor(ey).astype(jnp.int32)
    fx = ex - x0.astype(jnp.float32)
    fy = ey - y0.astype(jnp.float32)
    img = jnp.zeros((H, W), jnp.float32)
    w = valid.astype(jnp.float32)
    for dy, dx, wt in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        yy = jnp.clip(y0 + dy, 0, H - 1)
        xx = jnp.clip(x0 + dx, 0, W - 1)
        img = img.at[yy, xx].add(w * wt)
    return img


@functools.partial(
    jax.jit, static_argnames=("gcfg", "sensor", "n_theta", "theta_chunk")
)
def _global_sweep(
    S, ranges, gcfg: GridConfig, sensor: SensorConfig,
    n_theta: int, theta_chunk: int,
):
    H, W = S.shape
    pts, valid = scan_endpoints_local(ranges, sensor)
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    FS = jnp.fft.rfft2(S.astype(jnp.float32))

    thetas = (
        jnp.arange(n_theta, dtype=jnp.float32) * (2.0 * jnp.pi / n_theta)
        - jnp.pi
    )

    def corr_batch(th):
        def one(theta):
            E = _endpoint_image(pts, valid, theta, H, W, gcfg.resolution)
            # correlation theorem: corr[d] = IFFT(conj(FFT(E)) * FFT(S))[d]
            return jnp.fft.irfft2(jnp.conj(jnp.fft.rfft2(E)) * FS, s=(H, W))

        return jax.vmap(one)(th)

    corr = jax.lax.map(
        corr_batch, thetas.reshape(n_theta // theta_chunk, theta_chunk)
    ).reshape(n_theta, H, W) / denom
    flat = jnp.argmax(corr.reshape(-1))
    ti, d = jnp.divmod(flat, H * W)
    dr, dc = jnp.divmod(d, W)
    best = corr.reshape(-1)[flat]
    # peak-uniqueness margin: best minus the best OUTSIDE a ~1 m
    # translation box around the winner (any heading). Perceptual
    # aliasing (look-alike rooms) shows up as a second near-equal peak
    # far away — margin ~0 — while a unique lock has margin >> 0.
    ex = max(int(round(1.0 / gcfg.resolution)), 2)
    over_th = jnp.max(corr, axis=0)                       # [H, W]
    rr = jnp.arange(H, dtype=jnp.int32)
    cc = jnp.arange(W, dtype=jnp.int32)
    # CIRCULAR distance: the FFT displacement domain wraps, and a winner
    # near displacement 0/H has its own shoulder at row H-1
    ar = jnp.abs(rr - dr)
    ac = jnp.abs(cc - dc)
    near = (
        (jnp.minimum(ar, H - ar)[:, None] <= ex)
        & (jnp.minimum(ac, W - ac)[None, :] <= ex)
    )
    second = jnp.max(jnp.where(near, -jnp.inf, over_th))
    margin = best - jnp.maximum(second, -1e9)
    # robot cell v = displacement d + center (see module docstring)
    vr = jnp.mod(dr + H // 2, H)
    vc = jnp.mod(dc + W // 2, W)
    x = gcfg.origin_x + (vc.astype(jnp.float32) + 0.5) * gcfg.resolution
    y = gcfg.origin_y + (vr.astype(jnp.float32) + 0.5) * gcfg.resolution
    return jnp.stack([x, y, thetas[ti]]), best, margin


def global_localize(
    logodds,
    ranges,
    gcfg: GridConfig,
    mcfg: MatcherConfig,
    sensor: SensorConfig,
    n_theta: int = 72,
    theta_chunk: int = 8,
    search_space=None,
    refine: bool = True,
    return_margin: bool = False,
):
    """Returns (pose [3], score) — or (pose, score, margin) with
    return_margin=True, where margin is the peak-uniqueness diagnostic
    (best score minus the best score outside ~1 m of the winner, any
    heading; near-zero under perceptual aliasing). Gate on it before
    trusting a relocalization in self-similar environments.

    `n_theta` full-circle headings are FFT-swept; the winner seeds a
    match_scan refinement over +-1 theta step and a few cells (sub-cell /
    sub-step accuracy). Set refine=False for the raw grid peak."""
    assert n_theta % theta_chunk == 0, (n_theta, theta_chunk)
    S = (
        build_search_space(logodds, mcfg, gcfg.resolution)
        if search_space is None
        else search_space
    )
    coarse, score, margin = _global_sweep(
        S, ranges, gcfg, sensor, n_theta, theta_chunk
    )
    if not refine:
        return (coarse, score, margin) if return_margin else (coarse, score)
    import dataclasses

    step = 2.0 * np.pi / n_theta
    fine_mcfg = dataclasses.replace(
        mcfg,
        search_xy=max(2.5 * gcfg.resolution, 0.15),
        search_theta=step,
        n_theta=9,
        prior_xy_weight=0.0,
        prior_theta_weight=0.0,
        min_score=0.0,
    )
    pose, score = match_scan(
        logodds, ranges, coarse, gcfg, fine_mcfg, sensor, search_space=S
    )
    return (pose, score, margin) if return_margin else (pose, score)
