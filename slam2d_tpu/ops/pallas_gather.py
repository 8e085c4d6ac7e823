"""Ancestor-row gather for particle resampling as a Pallas DMA kernel
(SURVEY.md §9 "cross-shard resampling bandwidth" — the single-chip form).

_resample_copy's one-hot matmul is exact but costs P^2 * H * W MACs: at
P=1000 x 512^2 bf16 that is ~0.5 TFLOP per resample event. The copy is
really a row GATHER — P * H * W bytes of reads + writes — which Pallas
expresses directly: the ancestor table is scalar-prefetched and the input
BlockSpec's index_map reads block (ancestors[p], j) while the output
writes block (p, j). Pure DMA, HBM-bandwidth-bound (~1 GB of traffic per
event at those shapes instead of ~0.5 TFLOP).

XLA's own axis-0 gather of big rows lowers to a slow serialized path on
TPU (measured in round 1 — why the matmul form existed); the data-
dependent index_map is the idiomatic Pallas replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(anc_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(stacked, ancestors, interpret: bool = False):
    """stacked[ancestors] for a [P, H, W] (or [P, N]) tensor, as DMA.

    `ancestors` int32 [P]. Output is a fresh buffer (no aliasing: a row
    may be both source and destination, and grid programs execute in
    order — in-place would read overwritten rows)."""
    P = stacked.shape[0]
    shape = stacked.shape
    x = stacked.reshape(P, -1)
    N = x.shape[1]
    # column blocks: largest 128-multiple divisor of N within ~128K
    # elements keeps each DMA block comfortably inside VMEM; fall back to
    # the full row when N isn't 128-tileable (Mosaic needs the lane dim
    # to be a multiple of 128 or the whole array width)
    bn = N
    if N % 128 == 0:
        b = N
        while b % 2 == 0 and b > (1 << 17):
            b //= 2
        if b % 128 == 0 and N % b == 0:
            bn = b
    grid = (P, N // bn)

    # [P, 1, N] view: Mosaic requires the last TWO block dims to be
    # (8, 128)-tiled or equal the array dims — a (1, bn) block over
    # [P, N] fails the sublane rule, but (1, 1, bn) over [P, 1, N]
    # satisfies it (dim -2: block 1 == array 1)
    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bn), lambda p, j, anc: (anc[p], 0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bn), lambda p, j, anc: (p, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((P, 1, N), x.dtype),
        interpret=interpret,
    )(ancestors.astype(jnp.int32), x.reshape(P, 1, N))
    return out.reshape(shape)
