"""Pallas TPU kernel for the dense inverse-sensor-model map update
(SURVEY.md §2 L1 "Pallas raycast/update kernel").

The XLA dense update (grid/occupancy.py raycast_update_dense) is elegant
but needs per-cell lookups into the [B] beam table — and TPU XLA lowers
those gathers to a serialized ~3 ms/op path. This kernel inverts the loop:
iterate over BEAMS (a static 1-D loop over SMEM scalars) and evaluate each
beam's wedge/arc masks over the whole VMEM-resident cell block with pure
VPU math:

  free |= (cell in beam b's angular slot) & (d < rmin3[b] - res)
  occ  |= (angular distance to beam b <= tol/d) & (|d - r_b| <= 0.75 cell)

rmin3[b] = min of beam b and its neighbors' ranges (precomputed on the
host side of the trace) keeps the free carve conservative at grazing
incidence, matching the XLA dense semantics.

Design notes (measured on v5e, scripts/bench_update.py):
- A one-hot-matmul gather variant (nearest-beam k = round(phi/step), MXU
  contraction against a [B, 8] table — the ops/mxu_score.py trick) was
  tried and is 3x SLOWER than this loop: building the [cells, B] one-hot
  and reshaping it for the MXU forces Mosaic relayouts that dwarf the
  VPU math it saves. The beam loop is plain elementwise ops at full lane
  occupancy.
- The inner body is minimized to 12 vector ops/beam: the occ test
  compares dphi against a precomputed tol/d plane (hoists the per-beam
  multiply), boolean or-accumulation replaces where/max chains, and the
  hit test needs NO r_b > 0 guard — misses encode r_hit = -1, making
  |d - r_b| <= 0.75 res unsatisfiable for d >= 0.
- The loop is unrolled 8x (round-4 chip A/B: frontend hybrid 1.18 ->
  0.973 ms/update, PF batch 3.27 -> 3.16 ms; 4x was the round-1
  setting): Mosaic's per-iteration scalar-loop overhead is comparable
  to the ~12 VPU block ops of one beam (the caller pads the beam
  tables to the unroll multiple).
- ANGULAR BEAM-RANGE CLIP: a cell tile subtends a bounded bearing
  interval from the sensor, so most beams cannot touch it. Each kernel
  invocation reduces its tile to three scalars (phi_min, phi_max, d_min),
  widens the interval by max(half_slot, occ_tol / d_min) — conservative
  for both the free and occ tests (the occ angular gate tol/d is widest
  at the tile's nearest cell) — and converts it to [first, last) chunk
  bounds for ONE dynamic-trip fori_loop (branchless; a per-chunk
  lax.cond was measured slower than the work it skips). Tiles whose
  interval spans the +-pi wrap (or contain the sensor, where thr blows
  up) degrade to the full beam range. Clipping only pays when tiles are
  angularly narrow, so the grid tiles COLUMNS too (block_cols = 128
  when the width divides; full-width rows otherwise, where far row
  blocks still clip). The comparison axis is the kernel's own unwrapped
  phi, so the clip is exactly as wrap-blind as the per-cell test.

Beam encodings: r_hit[b] < 0 means "no hit" (occ test can't fire),
rmin3[b] < 0 means "invalid beam" (free test can't fire: d < -1 - res).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam2d_tpu.config import GridConfig, SensorConfig

_UNROLL = 8


def _atan_01(q):
    """Minimax polynomial arctan on [0, 1] (A&S 4.4.49, |err| ~ 2e-8 —
    Pallas TPU has no atan/atan2 primitive, so we implement it)."""
    q2 = q * q
    return q * (
        0.9999993329
        + q2 * (-0.3332985605
        + q2 * (0.1994653599
        + q2 * (-0.1390853351
        + q2 * (0.0964200441
        + q2 * (-0.0559098861
        + q2 * (0.0218612288
        + q2 * (-0.0040540580)))))))
    )


def _atan2(y, x):
    """atan2 from the polynomial arctan; the min/max-ratio form keeps the
    polynomial argument inside [0, 1]."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    q = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-20)
    a = _atan_01(q)                                    # [0, pi/4]
    a = jnp.where(ay > ax, 0.5 * jnp.pi - a, a)        # [0, pi/2]
    a = jnp.where(x < 0, jnp.pi - a, a)                # [0, pi]
    return jnp.where(y < 0, -a, a)                     # (-pi, pi]


def _update_kernel(
    scalars_ref,  # [8] SMEM f32: pose_x, pose_y, pose_theta, ox, oy, enable
    r_hit_ref,    # [B] SMEM f32: range if hit else -1
    rmin3_ref,    # [B] SMEM f32: neighborhood-min range if valid else -1
    rays_ref,     # [8, B] SMEM f32: exact-ray tables (see wrapper) or [1,1]
    g_ref,        # [BH, W] VMEM: log-odds block
    out_ref,      # [BH, W] VMEM
    *,
    n_beams: int,
    block_rows: int,
    block_cols: int,
    resolution: float,
    step: float,
    angle_min: float,
    l_free: float,
    l_occ: float,
    l_clamp: float,
    free_ray: bool = False,
    occ_exact: bool = False,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    px = scalars_ref[0]
    py = scalars_ref[1]
    ptheta = scalars_ref[2]
    ox = scalars_ref[3]
    oy = scalars_ref[4]
    enable = scalars_ref[5]
    rmax_eff = scalars_ref[6]   # max valid clipped range (-1: no valid beams)

    row = (
        lax.broadcasted_iota(jnp.int32, (block_rows, block_cols), 0).astype(jnp.float32)
        + (i * block_rows).astype(jnp.float32)
    )
    col = (
        lax.broadcasted_iota(jnp.int32, (block_rows, block_cols), 1).astype(jnp.float32)
        + (j * block_cols).astype(jnp.float32)
    )
    cx = ox + (col + 0.5) * resolution - px
    cy = oy + (row + 0.5) * resolution - py
    d2 = cx * cx + cy * cy
    half_slot = 0.5 * step
    occ_tol = 0.75 * resolution

    # RANGE EARLY-OUT: no test can fire on a tile whose nearest cell lies
    # beyond every beam (free needs d < rmin3 - res <= rmax_eff, occ needs
    # d <= r_hit + occ_tol <= rmax_eff + occ_tol). The update window is
    # statically sized by sensor.max_range, but the scan's REAL ranges
    # bound the touchable disk — far tiles clamp the beam loop to zero
    # trips (branch-free; a pl.when around the whole body was measured
    # 5% slower at long ranges from the duplicated epilogue).
    rmax_t = rmax_eff + occ_tol
    untouched = jnp.min(d2) > rmax_t * rmax_t

    d = jnp.sqrt(d2)
    phi = _atan2(cy, cx) - ptheta - angle_min
    phi = jnp.mod(phi + jnp.pi, 2 * jnp.pi) - jnp.pi
    # occ angular gate as a per-cell threshold plane: dphi * d <= tol
    # becomes dphi <= tol / d, hoisting the multiply out of the beam loop
    tol_d = occ_tol / jnp.maximum(d, 1e-6)

    # tile bearing interval + widest per-test angular tolerance -> the
    # [first, last) chunk range that can touch this tile (module docstring)
    phi_lo = jnp.min(phi)
    phi_hi = jnp.max(phi)
    thr = jnp.maximum(
        jnp.float32(half_slot), occ_tol / jnp.maximum(jnp.min(d), 1e-6)
    ) + jnp.float32(0.25 * step)  # slack: fp-rounding headroom for the
    #                               floor below (~4 orders of magnitude
    #                               above the actual error)
    n_chunks = (n_beams + _UNROLL - 1) // _UNROLL
    cspan = jnp.float32(_UNROLL * step)
    c_lo = jnp.floor((phi_lo - thr) / cspan).astype(jnp.int32)
    c_hi = jnp.floor((phi_hi + thr) / cspan).astype(jnp.int32) + 1
    full = (phi_hi - phi_lo) > jnp.float32(jnp.pi)
    c_lo = jnp.where(full, 0, jnp.clip(c_lo, 0, n_chunks))
    c_hi = jnp.where(full, n_chunks, jnp.clip(c_hi, 0, n_chunks))
    c_hi = jnp.where(untouched, c_lo, c_hi)   # range early-out: zero trips

    def chunk(bu, carry):
        free, occ = carry
        free_acc = None
        occ_acc = None
        # Inverse-sensor-model tests OR-accumulate booleans within the
        # unrolled chunk; one convert + max folds the chunk into the f32
        # loop carry (Mosaic vector-mask loop carries don't compile, and
        # this amortizes the conversion). The exact-ray variants
        # accumulate FLOATS instead (path length / per-beam endpoint
        # stacking — the sparse sampled-ray semantics).
        for k in range(_UNROLL):
            b = bu * _UNROLL + k
            ab = b.astype(jnp.float32) * step
            dphi = (
                jnp.abs(phi - ab) if (not free_ray or not occ_exact)
                else None
            )
            if free_ray:
                # exact chord of beam b's ray through each cell square:
                # cross-track trapezoid L(ct) (plateau res/max|dir|,
                # ramp slope 1/(|dx||dy|)), truncated to [0, r_free]
                # along-track — the closed form of what the sparse
                # path's point sampling counts (tables built in wrapper)
                dx = rays_ref[0, b]
                dy = rays_ref[1, b]
                w = rays_ref[2, b]     # valid / max(res, spacing)
                cm = rays_ref[3, b]
                hf = rays_ref[4, b]
                ia = rays_ref[5, b]
                rf = rays_ref[6, b]
                t = cx * dx + cy * dy
                ct = jnp.abs(cx * dy - cy * dx)
                L = jnp.maximum(jnp.minimum(cm, (hf - ct) * ia), 0.0)
                Lh = 0.5 * L
                f = w * jnp.maximum(
                    jnp.minimum(t + Lh, rf) - jnp.maximum(t - Lh, 0.0),
                    0.0,
                )
                free_acc = f if free_acc is None else free_acc + f
            else:
                rm = rmin3_ref[b] - resolution
                f = (dphi <= half_slot) & (d < rm)
                free_acc = f if free_acc is None else free_acc | f
            if occ_exact:
                er = rays_ref[7, b]
                ec = rays_ref[8, b]
                o = ((row == er) & (col == ec)).astype(jnp.float32)
                occ_acc = o if occ_acc is None else occ_acc + o
            else:
                r_b = r_hit_ref[b]
                o = (dphi <= tol_d) & (jnp.abs(d - r_b) <= occ_tol)
                occ_acc = o if occ_acc is None else occ_acc | o
        if free_ray:
            free = free + free_acc
        else:
            free = jnp.maximum(free, free_acc.astype(jnp.float32))
        if occ_exact:
            occ = occ + occ_acc
        else:
            occ = jnp.maximum(occ, occ_acc.astype(jnp.float32))
        return free, occ

    zeros = jnp.zeros((block_rows, block_cols), jnp.float32)
    free, occ = lax.fori_loop(c_lo, c_hi, chunk, (zeros, zeros))

    upd = (l_free * free + l_occ * occ) * enable
    g = g_ref[:, :].astype(jnp.float32)
    out_ref[:, :] = jnp.clip(g + upd, -l_clamp, l_clamp).astype(
        out_ref.dtype
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sensor", "interpret", "block_rows", "variant"),
)
def pallas_dense_update(
    logodds,
    pose,
    ranges,
    cfg: GridConfig,
    sensor: SensorConfig,
    enable=1.0,
    origin_xy=None,
    interpret: bool = False,
    block_rows: int = 32,
    variant: str = "ism",
):
    """Drop-in for raycast_update_dense backed by the Pallas kernel.
    Preserves the map dtype (PF maps may be bf16); accumulates in f32.

    variant:
      "ism"    — dense inverse-sensor-model tests (the round-1 kernel):
                 wedge free, |d - r| arc occ, boolean marks.
      "ray"    — SPARSE SAMPLED-RAY semantics in closed form (SURVEY §2
                 L1 "Pallas DDA raycast"): per-cell free evidence = the
                 beam's chord length through the cell / max(res, sample
                 spacing), summed over beams (multi-beam stacking, exactly
                 what raycast_update's point sampling converges to), and
                 occupied = l_occ per hitting beam whose ENDPOINT CELL is
                 this cell (floor-exact, stacking) — no arc spread.
      "hybrid" — wedge free (cheap) + exact endpoint-cell occ."""
    H, W = logodds.shape
    if H % block_rows:
        # largest 8-multiple divisor of H at most the requested block
        block_rows = max(
            (b for b in range(8, block_rows + 1, 8) if H % b == 0),
            default=8,
        )
    assert H % block_rows == 0, (H, block_rows)
    # column tiling narrows each tile's bearing interval so the angular
    # chunk skip bites; Mosaic needs the lane dim to be a multiple of 128
    # (or the full array width). A non-multiple width (the frontend's 520
    # window) would otherwise run ONE full-width tile whose bearing
    # interval spans the whole window, defeating the clip — pad columns
    # to the next 128 multiple instead (one pad+crop copy, ~µs; padded
    # cells lie beyond every beam's range and die in the early-outs;
    # measured at the 520² frontend window: hybrid 1.43 -> see
    # scripts/bench_update.py).
    pad_c = (-W) % 128 if W > 128 else 0
    if pad_c:
        logodds = jnp.pad(logodds, ((0, 0), (0, pad_c)))
    Wk = W + pad_c
    block_cols = 128 if Wk % 128 == 0 and Wk > 128 else Wk
    if origin_xy is None:
        ox, oy = cfg.origin_x, cfg.origin_y
    else:
        ox, oy = origin_xy

    B = sensor.n_beams
    step = sensor.fov_rad / max(B - 1, 1)
    r = jnp.clip(ranges.astype(jnp.float32), 0.0, sensor.max_range)
    valid = (ranges > sensor.min_range) & jnp.isfinite(ranges)
    hit = valid & (ranges < sensor.max_range)
    r_hit = jnp.where(hit, r, -1.0)
    rv = jnp.where(valid, r, jnp.inf)
    rmin3 = jnp.minimum(
        rv,
        jnp.minimum(
            jnp.concatenate([rv[:1], rv[:-1]]),
            jnp.concatenate([rv[1:], rv[-1:]]),
        ),
    )
    rmin3 = jnp.where(valid & jnp.isfinite(rmin3), rmin3, -1.0)

    free_ray = variant == "ray"
    occ_exact = variant in ("ray", "hybrid")
    if free_ray or occ_exact:
        import numpy as _np

        # the SAME angle table the sparse paths use (f64 host build cast
        # to f32) — an f32 rebuild differs by 1 ulp, enough to flip a
        # boundary endpoint into the neighboring cell
        angles = (
            jnp.asarray(_np.asarray(sensor.beam_angles()), jnp.float32)
            + pose[2]
        )
        dirx = jnp.cos(angles)
        diry = jnp.sin(angles)
        r_free = jnp.maximum(r - cfg.resolution, 0.0) * valid
        spacing = r_free / max(cfg.ray_samples, 1)
        w_free = valid / jnp.maximum(spacing, cfg.resolution)
        adx = jnp.abs(dirx)
        ady = jnp.abs(diry)
        amax = jnp.maximum(adx, ady)
        amin = jnp.minimum(adx, ady)
        cmax = cfg.resolution / jnp.maximum(amax, 1e-6)
        half = 0.5 * cfg.resolution * (adx + ady)
        invab = 1.0 / jnp.maximum(amax * amin, 1e-9)
        # endpoint cell (floor-exact, same lattice as raycast_update)
        ecol = jnp.floor(
            (pose[0] + dirx * r - jnp.asarray(ox, jnp.float32))
            / cfg.resolution
        )
        erow = jnp.floor(
            (pose[1] + diry * r - jnp.asarray(oy, jnp.float32))
            / cfg.resolution
        )
        ecol = jnp.where(hit, ecol, -1e9)
        erow = jnp.where(hit, erow, -1e9)
        rays = jnp.stack(
            [dirx, diry, w_free, cmax, half, invab, r_free, erow, ecol]
        )
    else:
        rays = jnp.zeros((9, B), jnp.float32)

    # pad beam tables to the kernel's unroll factor
    # (-1 encodes "can't fire" for both the free and occ tests)
    if B % _UNROLL:
        pad = _UNROLL - B % _UNROLL
        r_hit = jnp.concatenate([r_hit, jnp.full((pad,), -1.0, jnp.float32)])
        rmin3 = jnp.concatenate([rmin3, jnp.full((pad,), -1.0, jnp.float32)])
        # pad rays so nothing fires: w=0, r_free=0, endpoint far away
        rpad = jnp.zeros((9, pad), jnp.float32).at[7:9].set(-1e9)
        rays = jnp.concatenate([rays, rpad], axis=1)
        B = B + pad

    # tightest disk any test can touch (kernel range early-out); the 0.0
    # floor keeps the squared-radius compare meaningful when no beam is
    # valid (no test can fire then, so every skip is trivially correct)
    rmax_eff = jnp.maximum(jnp.max(jnp.where(valid, r, -1.0)), 0.0)
    scalars = jnp.stack(
        [
            pose[0], pose[1], pose[2],
            jnp.asarray(ox, jnp.float32), jnp.asarray(oy, jnp.float32),
            jnp.asarray(enable, jnp.float32),
            rmax_eff, jnp.float32(0.0),
        ]
    )

    kernel = functools.partial(
        _update_kernel,
        n_beams=B,
        block_rows=block_rows,
        block_cols=block_cols,
        resolution=cfg.resolution,
        step=float(step),
        angle_min=sensor.angle_min,
        l_free=cfg.l_free,
        l_occ=cfg.l_occ,
        l_clamp=cfg.l_clamp,
        free_ray=free_ray,
        occ_exact=occ_exact,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # scalars, r_hit, rmin3, rays
        grid=(H // block_rows, Wk // block_cols),
        in_specs=[
            pl.BlockSpec(
                (block_rows, block_cols),
                lambda i, j, *_: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, block_cols),
            lambda i, j, *_: (i, j),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, Wk), logodds.dtype),
        interpret=interpret,
    )(scalars, r_hit, rmin3, rays, logodds)
    return out[:, :W] if pad_c else out
