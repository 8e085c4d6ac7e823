"""Endpoint-splat shift-stack expansion as a Pallas kernel.

pf/shared_refine.py's scorer needs stack[g, dr*C+dc][h, w] =
E[g, h-dr, w-dc] (zero where the shift runs off the low edge) — R*C
statically-shifted copies of each theta-slice of the endpoint splat E.
The XLA form (endpoint_shift_stack) materializes it as R*C separate
pad+crop ops: correct, but it schedules ~375 small copies per refine
event (measured 1.78 ms at FastSLAM-1000 shapes, dominating the shared
stack build — VERDICT r2 item 4).

Here one program per theta slice keeps E_g VMEM-resident and emits all
R*C shifted views with in-register rolls (pltpu.roll wraps rows/cols
from the high edge; an iota mask zeroes them — same trick as
ops/pallas_corr.py, in the opposite shift direction): one E read + one
stack write of HBM traffic, no per-lag op scheduling.

Reference anchor: SURVEY.md §4.3 step 2 (per-particle refinement),
shared-stack formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stack_kernel(E_ref, out_ref, *, R: int, C: int):
    win = E_ref.shape[1]
    # Mosaic's tpu.dynamic_rotate only supports 32-bit lanes ("Rotate with
    # non-32-bit data" on chip for bf16, round-3 finding) — roll in f32 and
    # cast back on store, so the HBM stack write stays in E's dtype.
    E = E_ref[0].astype(jnp.float32)                    # [win, win]
    ri = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1)
    for dr in range(R):
        rolled_r = pltpu.roll(E, dr, axis=0) if dr else E
        rmask = ri >= dr
        for dc in range(C):
            rolled = pltpu.roll(rolled_r, dc, axis=1) if dc else rolled_r
            ok = rmask & (ci >= dc)
            out_ref[0, dr * C + dc] = jnp.where(
                ok, rolled, jnp.zeros_like(rolled)
            ).astype(out_ref.dtype)


def stack_supported(win: int, R: int, C: int, itemsize: int) -> bool:
    """VMEM budget: the [R*C, win, win] out block + the E block must sit
    within Mosaic's scoped-VMEM stack (16 MB; keep ~2x headroom like
    pf/shared_refine's blur gate — CLAUDE.md hard-won rule: validate any
    new gate on chip, CPU interpret can't see the limit)."""
    # the E operand and the in-register rolls run in f32 (see _stack_kernel)
    vmem = R * C * win * win * itemsize + 3 * win * win * 4
    return win % 8 == 0 and vmem <= 7 * 2**20


@functools.partial(jax.jit, static_argnames=("R", "C", "interpret"))
def shift_stack_pallas(E, R: int, C: int, interpret: bool = False):
    """stack[g, dr*C + dc, h, w] = E[g, h-dr, w-dc] (0 off the low edge).

    Args: E [G, win, win] (any float dtype; preserved).
    Returns: [G, R*C, win, win] in E's dtype.
    """
    G, win, win2 = E.shape
    assert win == win2, E.shape
    kernel = functools.partial(_stack_kernel, R=R, C=C)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, win, win), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R * C, win, win), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, R * C, win, win), E.dtype),
        interpret=interpret,
    )(E)
