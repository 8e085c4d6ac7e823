"""Fused per-particle window + search-field build as one Pallas kernel.

The shared-anchor PF refinement (pf/shared_refine.py) spends its
per-particle bandwidth on a chain of window ops before the one big scoring
matmul: dynamic-slice window extract from the particle's map, roll to the
unclamped frame, out-of-map masking, zero-pad, separable Gaussian blur,
the free-space-penalty field math, and an astype — each a separate HBM
round-trip when XLA declines to fuse across the pallas blur boundary.

This kernel does the whole chain with ONE read of the map window and ONE
write of the field. Per grid program (= one particle):

  1. DMA an 8/128-aligned superset of the window straight from the
     particle's HBM-resident map into VMEM (the window origin is data
     dependent — scalar-prefetched row/col origins, clipped and aligned
     in-kernel). Loads are double-buffered across grid programs: program
     p starts p+1's copy before computing on p's, so the HBM read rides
     under the field math.
  2. In-register dynamic rolls bring the true (unclamped, possibly
     out-of-map) window origin to a fixed padded frame position; a
     select against the in-window/in-map mask zeroes everything else,
     including the rolled-in alignment slack (matches
     pf/shared_refine.aligned_window semantics: out-of-map == log-odds 0).
  3. The evidence-weighted occupied field, separable blur (static
     shift-and-add over the zero pads, exactly match/correlative.py
     _separable_blur's zero-padding semantics), and free-space penalty
     (match/correlative.py build_search_space) run on the VMEM-resident
     frame.
  4. The [win, win] field is written out in the scorer's compute dtype.

Reference anchor: fuses SURVEY.md §4.1 step 1 (search-space construction)
for the per-particle maps of §4.3 step 2.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _field_kernel(
    a_ref,
    b_ref,
    grids_ref,
    out_ref,
    load_ref,
    sem,
    *,
    taps,
    pad,
    win,
    Hm,
    Wm,
    inv_sat,
    free_logit,
    free_penalty,
    out_dtype,
):
    p = pl.program_id(0)
    nP = pl.num_programs(0)
    Rd = win + 2 * pad          # DMA rows (sublane-aligned origin slack)
    # DMA cols: origin slack + rounded up so the lane dim is a 128-multiple
    # (Mosaic's dynamic_rotate rejects unaligned lane widths)
    Cd = ((win + 128 + 127) // 128) * 128

    def dma(i, slot):
        # aligned DMA origin: covers [max(a,0), min(a+win, Hm)) because
        # a8 >= a-7 (or 0) and a8+Rd >= a+win+1 (or Hm); Hm%8==0 and
        # Wm%128==0 are gated by the caller so the clips keep alignment.
        a8 = jnp.clip((a_ref[i] // 8) * 8, 0, Hm - Rd)
        b8 = jnp.clip((b_ref[i] // 128) * 128, 0, Wm - Cd)
        a8 = pl.multiple_of(a8, 8)
        b8 = pl.multiple_of(b8, 128)
        return pltpu.make_async_copy(
            grids_ref.at[i, pl.ds(a8, Rd), pl.ds(b8, Cd)],
            load_ref.at[slot],
            sem.at[slot],
        )

    # double buffering across grid programs (scratch persists): program p
    # kicks off p+1's window copy before computing on p's, so the HBM
    # read rides under the field math instead of serializing with it
    @pl.when(p == 0)
    def _():
        dma(0, 0).start()

    @pl.when(p + 1 < nP)
    def _():
        dma(p + 1, (p + 1) % 2).start()

    dma(p, p % 2).wait()
    a = a_ref[p]                # true (unclamped) window row origin
    b = b_ref[p]
    a8 = jnp.clip((a // 8) * 8, 0, Hm - Rd)
    b8 = jnp.clip((b // 128) * 128, 0, Wm - Cd)

    x = load_ref[p % 2].astype(jnp.float32)           # [Rd, Cd]
    # bring load origin (a - a8, b - b8) to frame position (pad, pad) —
    # both dynamic rotates run on the lane-aligned [Rd, Cd] buffer — then
    # crop the slack; rolled-in wrap junk (incl. uninitialized DMA slack)
    # dies in the mask
    F = win + 2 * pad
    x = pltpu.roll(x, (pad - (b - b8)) % Cd, axis=1)
    x = pltpu.roll(x, (pad - (a - a8)) % Rd, axis=0)
    x = x[0:F, 0:F]

    ri = jax.lax.broadcasted_iota(jnp.int32, (F, F), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)
    mr = a + (ri - pad)                               # map row per frame cell
    mc = b + (ci - pad)
    valid = (
        (ri >= pad) & (ri < pad + win) & (mr >= 0) & (mr < Hm)
        & (ci >= pad) & (ci < pad + win) & (mc >= 0) & (mc < Wm)
    )
    gw = jnp.where(valid, x, 0.0)                     # log-odds window frame

    # evidence-weighted occupancy + separable blur over the zero pads
    occ = jnp.clip(gw * inv_sat, 0.0, 1.0)
    hw = (len(taps) - 1) // 2
    v = None
    for i, kv in enumerate(taps):
        t = pltpu.roll(occ, (F + hw - i) % F, axis=0) * kv
        v = t if v is None else v + t
    h = None
    for i, kv in enumerate(taps):
        t = pltpu.roll(v, (F + hw - i) % F, axis=1) * kv
        h = t if h is None else h + t
    blur = jnp.clip(h, 0.0, 1.0)

    # free-space penalty: p(occ) < thr  <=>  log-odds < logit(thr)
    free = (gw < free_logit).astype(jnp.float32)
    S = blur - free_penalty * free * (1.0 - blur)

    S = pltpu.roll(pltpu.roll(S, F - pad, axis=0), F - pad, axis=1)
    out_ref[0, :, :] = S[0:win, 0:win].astype(out_dtype)


def fused_field_supported(Hm: int, Wm: int, win: int, pad: int) -> bool:
    """The aligned-DMA covering argument needs 8/128-divisible map dims and
    room for the alignment slack. The win cap is Mosaic's SCOPED VMEM
    STACK limit (16 MB): the whole-frame-resident field math measured
    20.59 M scoped at win=528 on chip (AOT compile OOM) — the same
    failure mode as the blur kernel's documented 512² OOM. 416 leaves
    ~25% headroom; larger windows fall back to the XLA chain."""
    Rd = win + 2 * pad
    Cd = ((win + 128 + 127) // 128) * 128
    return (
        Hm % 8 == 0 and Wm % 128 == 0 and Hm >= Rd and Wm >= Cd
        and pad <= 64 and win <= 416
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "win", "taps", "inv_sat", "free_logit", "free_penalty", "out_dtype",
        "interpret",
    ),
)
def fused_window_field(
    grids,
    origins,
    win: int,
    taps: tuple,
    inv_sat: float,
    free_logit: float,
    free_penalty: float,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Batched window extraction + search-field build.

    Args:
      grids: [P, Hm, Wm] per-particle log-odds maps (f32 or bf16).
      origins: [P, 2] int32 UNCLAMPED window origins (row, col) — the
        window's top-left cell; cells outside the map read as log-odds 0.
      win: window size (the field is [win, win] per particle).
      taps: odd-length tuple of float blur taps.
      inv_sat: 1 / occ_evidence_sat.
      free_logit: log-odds below which a cell counts as known-free
        (logit of MatcherConfig.free_threshold).
      free_penalty: MatcherConfig.free_penalty.
    Returns:
      [P, win, win] fields in out_dtype.
    """
    P, Hm, Wm = grids.shape
    hw = len(taps) // 2
    pad = max(8, ((hw + 7) // 8) * 8)
    if not fused_field_supported(Hm, Wm, win, pad):
        raise ValueError(
            f"fused field unsupported for map {Hm}x{Wm}, win {win}, pad {pad}"
        )
    kernel = functools.partial(
        _field_kernel,
        taps=tuple(float(t) for t in taps),
        pad=pad,
        win=win,
        Hm=Hm,
        Wm=Wm,
        inv_sat=float(inv_sat),
        free_logit=float(free_logit),
        free_penalty=float(free_penalty),
        out_dtype=out_dtype,
    )
    Rd = win + 2 * pad
    Cd = ((win + 128 + 127) // 128) * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                        # row/col origins (SMEM)
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],      # maps stay in HBM
        out_specs=pl.BlockSpec(
            (1, win, win), lambda p, *_: (p, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Rd, Cd), grids.dtype),   # double-buffered window
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, win, win), out_dtype),
        interpret=interpret,
    )(
        origins[:, 0].astype(jnp.int32),
        origins[:, 1].astype(jnp.int32),
        grids,
    )
