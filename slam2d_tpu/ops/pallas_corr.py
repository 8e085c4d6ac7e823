"""Offset-correlation scoring as a Pallas VMEM kernel ("cmx").

The endpoint-image ("emx", ops/mxu_score.py) scorer computes

    score[t, dr, dc] = <E_t, S shifted by (dr, dc)>

by materializing all R*C statically-shifted copies of S in HBM and taking
one [T, H*W] x [R*C, H*W] matmul. The shift stack is pure bandwidth: at
FastSLAM refine shapes it is ~4 MB per particle written+read per score.
This kernel instead keeps S (zero-padded) and one theta-slice of E resident
in VMEM and produces every (dr, dc) lag with in-register rolls — HBM
traffic drops to reading E and S exactly once.

Shift semantics match emx's stack exactly: Sp = pad(S, [(0, R), (0, C)]),
lag (dr, dc) reads Sp[dr:dr+H, dc:dc+W]. A double pltpu.roll by (-dr, -dc)
wraps rows 0..dr-1 to indices >= H (because dr <= R), so the [0:H, 0:W]
slice of the rolled array IS that shifted view — and slicing at offset 0
keeps every access sublane/lane-aligned (Mosaic's unaligned-slice paths
are slow; see ops/pallas_score.py).

Grid is over theta so VMEM holds one [H, W] E-slice at a time (the same
kernel then serves the frontend's 544^2 windows and the PF's 288^2 ones);
Sp's index map is constant, so Mosaic fetches it once and revisits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(E_ref, Sp_ref, out_ref, *, R: int, C: int):
    H = E_ref.shape[1]
    W = E_ref.shape[2]
    HR = Sp_ref.shape[0]
    WC = Sp_ref.shape[1]
    E = E_ref[0].astype(jnp.float32)                    # [H, W]
    for dr in range(R):
        rolled_r = pltpu.roll(Sp_ref[:], (HR - dr) % HR, axis=0)
        for dc in range(C):
            rolled = pltpu.roll(rolled_r, (WC - dc) % WC, axis=1)
            shifted = rolled[0:H, 0:W]
            # scalar store to the SMEM output block; the block is 3D
            # (1, 1, R*C) so its last two dims equal the array's — the
            # only un-tiled shape Mosaic's block check accepts
            out_ref[0, 0, dr * C + dc] = jnp.sum(E * shifted)


@functools.partial(jax.jit, static_argnames=("R", "C", "interpret"))
def corr_scores_pallas(E, Sp, R: int, C: int, interpret: bool = False):
    """score[t, dr*C + dc] = sum_{h,w} E[t, h, w] * Sp[h+dr, w+dc].

    Args:
      E: [T, H, W] endpoint splat images (any float dtype; f32 accumulate).
      Sp: [H+R, W+C] search space, zero-padded on the high sides (the emx
        stack layout).
    Returns: [T, R*C] float32.
    """
    T, H, W = E.shape
    assert Sp.shape == (H + R, W + C), (Sp.shape, (H + R, W + C))
    kernel = functools.partial(_corr_kernel, R=R, C=C)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H + R, W + C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, R * C), lambda t: (t, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, R * C), jnp.float32),
        interpret=interpret,
    )(E, Sp.astype(jnp.float32))[:, 0, :]
