"""Pallas TPU kernel for correlative-match scoring (SURVEY.md §4.1 hot loop).

The XLA formulation of candidate scoring materializes a [T, R, C, B] gather
from the search-space window — ~1M random HBM/VMEM accesses per match, the
single hottest op in the frontend. This kernel exploits the structure the
gather throws away: for one (theta, beam) the [R, C] offsets form a
CONTIGUOUS patch of S. So per theta-slice (one grid program):

  for each beam: one dynamic-slice patch read from the VMEM-resident
  window + a 4-tap bilinear blend + accumulate into the [R, C] score tile.

S stays in VMEM across the whole grid (it is the same block for every
program), beam coordinates arrive via scalar prefetch (SMEM), and the
per-beam work is a handful of VPU ops on a tiny tile — no gather anywhere.

Interpret mode makes the same kernel run on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _score_kernel(rows_ref, cols_ref, wts_ref, S_ref, out_ref, acc_ref, *, n_beams, R, C):
    """One program = one theta slice.

    rows_ref/cols_ref: [T, B] int32 in SMEM (scalar prefetch) — patch start
      (already offset by the window radius and clipped by the caller).
    wts_ref: [T, B, 4] f32 in SMEM — bilinear corner weights, zeroed for
      invalid beams.
    S_ref: [H, W] f32 in VMEM (whole window, shared across programs).
    out_ref: [1, R, C] f32.
    acc_ref: [R, C] f32 scratch.
    """
    t = pl.program_id(0)

    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def body(b, _):
        r0 = rows_ref[t, b]
        c0 = cols_ref[t, b]
        # Mosaic requires the sublane (second-to-last) start of a vector
        # load to be provably 8-aligned: read an aligned, taller patch and
        # pick the residual shift with an 8-way static-slice switch.
        # The LANE start can't be dynamic at all (vector loads need a
        # provable 128-multiple): read full-width rows and bring column c0
        # to lane 0 with a dynamic rotate (the caller pads W to 128k).
        r0a = pl.multiple_of((r0 // 8) * 8, 8)
        W = S_ref.shape[1]
        tall = S_ref[pl.ds(r0a, R + 1 + 8), :]
        tall = pltpu.roll(tall, W - c0, axis=1)
        patch = jax.lax.switch(
            r0 - r0a,
            [lambda x, k=k: x[k : k + R + 1, :] for k in range(8)],
            tall,
        )
        w00 = wts_ref[t, b, 0]
        w01 = wts_ref[t, b, 1]
        w10 = wts_ref[t, b, 2]
        w11 = wts_ref[t, b, 3]
        acc_ref[:, :] += (
            patch[:R, :C] * w00
            + patch[:R, 1 : C + 1] * w01
            + patch[1 : R + 1, :C] * w10
            + patch[1 : R + 1, 1 : C + 1] * w11
        )
        return 0

    jax.lax.fori_loop(0, n_beams, body, 0)
    out_ref[0, :, :] = acc_ref[:, :]


@functools.partial(jax.jit, static_argnames=("R", "C", "interpret"))
def score_offsets_pallas(S, rows, cols, wts, R: int, C: int, interpret: bool = False):
    """Scores [T, R, C] = sum_b bilinear(S)[patch_b + offsets].

    Args:
      S: [H, W] float32 search-space window (VMEM-sized).
      rows / cols: [T, B] int32 patch starts (pre-clipped to [0, dim-(R+1)]).
      wts: [T, B, 4] float32 bilinear corner weights ((1-fr)(1-fc),
        (1-fr)fc, fr(1-fc), fr*fc), zero for invalid beams.
    """
    T, B = rows.shape
    # pad the lane dim to a 128-multiple (Mosaic vector-load tiling) and
    # the sublane dim for the kernel's 8-aligned tall reads
    H, W = S.shape
    pad_w = (-W) % 128
    pad_h = 8 + (-H) % 8
    if pad_w or pad_h:
        S = jnp.pad(S, ((0, pad_h), (0, pad_w)))
    kernel = functools.partial(_score_kernel, n_beams=B, R=R, C=C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # rows, cols in SMEM
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # wts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # S (whole array)
        ],
        out_specs=pl.BlockSpec(
            (1, R, C), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((R, C), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, R, C), jnp.float32),
        interpret=interpret,
    )(rows, cols, wts, S)


def prep_patch_indices(pos_row, pos_col, valid, n_off_r: int, n_off_c: int, H: int, W: int):
    """Turn fractional endpoint positions into (rows, cols, wts) kernel inputs.

    pos_row/pos_col: [T, B] fractional cell-center coordinates of endpoints.
    Offsets are assumed to be arange(-(n_off_r//2), ...) — the patch spans
    [floor(pos) - ra, floor(pos) - ra + n_off_r] per axis.
    Returns rows, cols int32 [T, B] and wts [T, B, 4] (invalid beams -> 0).
    """
    ra = n_off_r // 2
    ca = n_off_c // 2
    r0 = jnp.floor(pos_row)
    c0 = jnp.floor(pos_col)
    fr = (pos_row - r0)[..., None]
    fc = (pos_col - c0)[..., None]
    wts = jnp.concatenate(
        [(1 - fr) * (1 - fc), (1 - fr) * fc, fr * (1 - fc), fr * fc], axis=-1
    )
    rows = r0.astype(jnp.int32) - ra
    cols = c0.astype(jnp.int32) - ca
    # out-of-window patches: clip and zero the weights (edge beams)
    # row bound leaves 8 extra rows for the kernel's aligned tall read
    row_hi = H - (n_off_r + 1) - 8
    col_hi = W - (n_off_c + 1)
    ok = (
        (rows >= 0) & (rows <= row_hi)
        & (cols >= 0) & (cols <= col_hi)
        & valid[None, :]
    )
    wts = jnp.where(ok[..., None], wts, 0.0)
    rows = jnp.clip(rows, 0, row_hi)
    cols = jnp.clip(cols, 0, col_hi)
    return rows, cols, wts
