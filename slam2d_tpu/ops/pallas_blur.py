"""Separable Gaussian blur as a single-VMEM-residency Pallas kernel.

The XLA shift-and-add blur (match/correlative.py _separable_blur) beats
TPU XLA's tiny-channel conv lowering, but each of its ~2*(2*hw+1)
statically-shifted terms can materialize a window-sized intermediate when
XLA declines to fuse the chain — measured 2.07 ms for 100 x 288^2 windows
where the pure read+write floor is ~0.08 ms. This kernel keeps the whole
(zero-padded) image in VMEM and runs both blur axes as in-register
pltpu.roll + multiply-add chains, reading and writing HBM exactly once.

Alignment: the input is padded by a multiple of 8 on every side (>= the
kernel halfwidth), so every roll stays within the zero pads (exact
zero-padding semantics, matching _separable_blur), and the final
valid-region extraction is a roll to offset 0 + an aligned [0:H, 0:W]
slice (Mosaic's unaligned-slice paths are slow — same trick as
ops/pallas_corr.py).

Whole-array blocks cap the usable size at Mosaic's SCOPED VMEM stack
(16 MB): a 512^2 window measured 20.2M scoped and OOMed on chip, so
callers gate at <= 448^2 (pf/shared_refine.py) and keep the XLA
shift-and-add chain for larger windows / full-map builds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blur_kernel(x_ref, out_ref, *, taps, pad, H, W):
    Hp, Wp = x_ref.shape
    x = x_ref[:, :]
    hw = (len(taps) - 1) // 2
    v = None
    for i, kv in enumerate(taps):
        t = pltpu.roll(x, (Hp + hw - i) % Hp, axis=0) * kv
        v = t if v is None else v + t
    h = None
    for i, kv in enumerate(taps):
        t = pltpu.roll(v, (Wp + hw - i) % Wp, axis=1) * kv
        h = t if h is None else h + t
    h = pltpu.roll(pltpu.roll(h, Hp - pad, axis=0), Wp - pad, axis=1)
    out_ref[:, :] = h[0:H, 0:W]


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def separable_blur_pallas(img, taps: tuple, interpret: bool = False):
    """Zero-padded separable blur, bit-compatible with _separable_blur's
    semantics (f32 accumulation, same tap order).

    Args:
      img: [H, W] float array.
      taps: odd-length tuple of python-float kernel taps.
    """
    H, W = img.shape
    hw = len(taps) // 2
    pad = ((hw + 7) // 8) * 8
    xp = jnp.pad(img.astype(jnp.float32), ((pad, pad), (pad, pad)))
    kernel = functools.partial(
        _blur_kernel, taps=tuple(float(t) for t in taps), pad=pad, H=H, W=W
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(xp.shape, lambda: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((H, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,
    )(xp)
