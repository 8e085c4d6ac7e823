"""Shared-anchor PF map-update APPLY as one Pallas kernel.

pf/shared_update.py builds G scan update images (cheap, shared across
particles) and then adds each particle's slot image into its map window
at its anchor cell. The XLA form of that apply materializes a per-
particle [P, win, win] f32 image selection (one-hot matmul), rolls it,
masks it, and window-writes the maps — ~790 MB of HBM traffic per update
event at P=1000 x 256² windows. But the apply is really

    window(maps[p]) += roll(images[slot[p]], anchor offset), clipped

— one read + one write of each particle's window plus ONE VMEM-resident
copy of the G images. This kernel does exactly that, per grid program
(= one particle):

  1. DMA an 8/128-aligned superset of the particle's window from its
     HBM-resident map into VMEM (double-buffered across programs: p
     kicks off p+1's load first, like ops/pallas_field.py).
  2. Select the particle's slot image (scalar-prefetched slot index into
     the VMEM-resident [G, win, win] image stack), roll it to the
     window's frame offset, and mask the true (unclamped) image extent —
     image cells falling outside the map are DROPPED, matching
     shared_update's XLA border semantics.
  3. Add, clip to ±l_clamp, write the superset back to the SAME buffer
     (the maps operand is input/output-aliased — in-place in HBM), with
     the store DMA pipelined two programs deep.

Reference anchor: SURVEY.md §4.3 step 4 (per-particle map update),
apply stage of the shared-anchor restructuring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_kernel(
    *refs,
    win, pad, Hm, Wm, l_clamp, out_dtype, bilinear, fused_ep,
):
    # operand layout (scalar prefetch first):
    #   snapped:  ar, ac, slot,         images, [ep...], maps, out, scratch
    #   bilinear: ar, ac, slot, qr, qc, images, [ep...], maps, out, scratch
    # fused_ep inserts ep_r/ep_c/ep_w ([1, Bpad] blocks per particle:
    # exact endpoint MAP cells + per-beam weights) between images and maps.
    # qr/qc are the sub-cell shift in 1/256-cell units, in [-128, 128).
    # The snapped variant keeps the 3-scalar signature so the production
    # kernel is UNCHANGED by the bilinear addition (an unused scalar-
    # prefetch operand is an untested Mosaic corner — round-3 rule: never
    # perturb a validated production kernel for an opt-in variant).
    # maps_ref is ALIAS-ONLY: never read/written directly;
    # input_output_aliases makes out_ref the same buffer, and ALL
    # loads/stores must go through out_ref so the read-modify-write
    # stays coherent.
    ep_refs = ()
    if bilinear:
        (ar_ref, ac_ref, slot_ref, qr_ref, qc_ref,
         images_ref, *rest) = refs
    else:
        (ar_ref, ac_ref, slot_ref,
         images_ref, *rest) = refs
    if fused_ep:
        ep_refs, rest = tuple(rest[:3]), rest[3:]
    (maps_ref, out_ref, load_ref, res_ref, lsem, ssem) = rest
    p = pl.program_id(0)
    nP = pl.num_programs(0)
    Rd = win + 2 * pad
    # bilinear extends the image extent by one row/col; the -1-shifted
    # alignment origin (below) adds one more cell of needed headroom
    Cd = ((win + (130 if bilinear else 128) + 127) // 128) * 128

    def origin(i):
        # aligned superset origin; covering argument as in pallas_field.
        # bilinear anchors one cell earlier so the -1 fractional shift
        # (floor of a [-0.5, 0.5) offset) never lands content at frame
        # row/col -1: offr = ar - a8 is then >= 1.
        ab = ar_ref[i] - (1 if bilinear else 0)
        bb = ac_ref[i] - (1 if bilinear else 0)
        a8 = jnp.clip((ab // 8) * 8, 0, Hm - Rd)
        b8 = jnp.clip((bb // 128) * 128, 0, Wm - Cd)
        return pl.multiple_of(a8, 8), pl.multiple_of(b8, 128)

    def load(i, s):
        a8, b8 = origin(i)
        return pltpu.make_async_copy(
            out_ref.at[i, pl.ds(a8, Rd), pl.ds(b8, Cd)],
            load_ref.at[s], lsem.at[s],
        )

    def store(i, s):
        a8, b8 = origin(i)
        return pltpu.make_async_copy(
            res_ref.at[s],
            out_ref.at[i, pl.ds(a8, Rd), pl.ds(b8, Cd)],
            ssem.at[s],
        )

    # double-buffered loads: program p starts p+1's window DMA up front
    @pl.when(p == 0)
    def _():
        load(0, 0).start()

    @pl.when(p + 1 < nP)
    def _():
        load(p + 1, (p + 1) % 2).start()

    load(p, p % 2).wait()
    s = p % 2

    # the store issued two programs ago reused this result slot
    @pl.when(p >= 2)
    def _():
        store(p - 2, s).wait()

    x = load_ref[s].astype(jnp.float32)                       # [Rd, Cd]
    ar = ar_ref[p]
    ac = ac_ref[p]
    a8, b8 = origin(p)
    # bilinear sub-cell placement: the particle sits frac = q/256 cells
    # from its anchor's center; split the shift into an integer floor
    # (folded into the frame roll) and a fractional remainder applied as
    # a 2-tap blend per axis — first-order-exact increment centroid,
    # zero extra HBM traffic (VERDICT r2 item 3: translation term of the
    # shared-update quantization)
    if bilinear:
        # floor(q/256) for q in [-128, 128) is just the sign test — an
        # explicit where, NOT `q >> 8`: a right shift of a negative int32
        # is an interpret-vs-Mosaic semantics corner (numpy shifts are
        # arithmetic; trusting the lowering here is exactly the CPU-
        # can't-see-it trap CLAUDE.md warns about)
        br = jnp.where(qr_ref[p] < 0, -1, 0)
        bc = jnp.where(qc_ref[p] < 0, -1, 0)
        sr = (qr_ref[p] - br * 256).astype(jnp.float32) / 256.0
        sc = (qc_ref[p] - bc * 256).astype(jnp.float32) / 256.0
    else:
        br = bc = 0
    offr = ar - a8 + br   # image row 0 sits at frame row offr (may be < 0
    offc = ac - b8 + bc   # or > Rd - win at map borders -> cells drop)
    ext = win + (1 if bilinear else 0)

    img = images_ref[slot_ref[p]].astype(jnp.float32)         # [win, win]
    frame = jnp.pad(img, ((0, Rd - win), (0, Cd - win)))
    frame = pltpu.roll(frame, offr % Rd, axis=0)
    frame = pltpu.roll(frame, offc % Cd, axis=1)
    if bilinear:
        down = pltpu.roll(frame, 1, axis=0)
        frame = frame * (1.0 - sr) + down * sr
        right = pltpu.roll(frame, 1, axis=1)
        frame = frame * (1.0 - sc) + right * sc
    ri = jax.lax.broadcasted_iota(jnp.int32, (Rd, Cd), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (Rd, Cd), 1)
    # true (unwrapped) image extent; wrapped-in junk and out-of-map image
    # cells die here
    ok = (ri >= offr) & (ri < offr + ext) & (ci >= offc) & (ci < offc + ext)

    y = jnp.clip(x + jnp.where(ok, frame, 0.0), -l_clamp, l_clamp
                 ).astype(out_dtype)
    if fused_ep:
        # Exact-endpoint occupancy marks fused into the same window
        # residency (VERDICT r4 item 4): the separate one-hot-matmul
        # pass cost a second read+write of every particle's window
        # (~6% of FastSLAM-1000). Numerics mirror the unfused path
        # (grid/occupancy.endpoint_update + ops/mxu_update.
        # scatter_add_mxu) op for op: f32 one-hot rows scaled by w,
        # cast bf16, bf16xbf16->f32 MXU contraction over beams, image
        # cast to the map dtype, added and clipped in map dtype.
        ep_r_ref, ep_c_ref, ep_w_ref = ep_refs
        fr = (ep_r_ref[0, 0] - a8)[:, None]               # [Bpad, 1]
        fc = (ep_c_ref[0, 0] - b8)[:, None]
        w_b = ep_w_ref[0, 0][:, None]                     # [Bpad, 1] f32
        Bpad = fr.shape[0]
        ri_b = jax.lax.broadcasted_iota(jnp.int32, (Bpad, Rd), 1)
        ci_b = jax.lax.broadcasted_iota(jnp.int32, (Bpad, Cd), 1)
        R1 = ((fr == ri_b).astype(jnp.float32) * w_b).astype(jnp.bfloat16)
        C1 = (fc == ci_b).astype(jnp.bfloat16)
        img_ep = jax.lax.dot_general(
            R1, C1, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [Rd, Cd]
        y = jnp.clip(y + img_ep.astype(out_dtype), -l_clamp, l_clamp)
    res_ref[pl.ds(s, 1), :, :] = y[None]
    store(p, s).start()

    # drain the last two stores before the kernel retires
    @pl.when(p == nP - 1)
    def _():
        store(p, s).wait()

    @pl.when((p == nP - 1) & (p >= 1))
    def _():
        store(p - 1, 1 - s).wait()


def shared_apply_supported(
    Hm: int, Wm: int, win: int, n_images: int = 16,
    image_bytes: int = 4, map_bytes: int = 4, bilinear: bool = True,
    ep_beams: int = 0,
) -> bool:
    """Aligned-DMA covering argument + VMEM budget. The budget must count
    the VMEM-RESIDENT image stack (n_images grows with update_subcell^2
    and update_theta_slots, not just win): images + 4 load/result slots
    + ~3 live [Rd, Cd] f32 compute frames, capped at 12 MB — below
    Mosaic's 16 MB scoped-VMEM stack limit with the headroom the blur
    kernel's measured 512² OOM taught (CLAUDE.md).

    bilinear: budget the bilinear variant's +2-lane column frame (which
    rounds up a further 128 lanes when win is a multiple of 128).
    Defaults True (conservative); snapped-only callers pass False so a
    128-aligned window doesn't silently fall back to the XLA path
    (ADVICE r3)."""
    pad = 8
    Rd = win + 2 * pad
    Cd = ((win + (130 if bilinear else 128) + 127) // 128) * 128
    vmem = (
        n_images * win * win * image_bytes
        + 4 * Rd * Cd * map_bytes
        + 3 * Rd * Cd * 4
        # fused exact-endpoint pass: bf16 one-hot row/col matrices +
        # the f32 endpoint image (ep_beams already 128-padded)
        + ep_beams * (Rd + Cd) * 2 + (Rd * Cd * 4 if ep_beams else 0)
    )
    return (
        Hm % 8 == 0 and Wm % 128 == 0 and Hm >= Rd and Wm >= Cd
        and win <= 384 and vmem <= 12 * 2**20
    )


@functools.partial(
    jax.jit,
    static_argnames=("win", "l_clamp", "interpret"),
    donate_argnums=(0,),
)
def shared_apply_update(
    maps,
    anchors_rc,
    slots,
    images,
    win: int,
    l_clamp: float,
    interpret: bool = False,
    frac_rc=None,
    ep_rows=None,
    ep_cols=None,
    ep_w=None,
):
    """In-place windowed add of per-slot update images into particle maps.

    Args:
      maps: [P, Hm, Wm] per-particle log-odds (donated; updated in place).
      anchors_rc: [P, 2] int32 anchor CELLS (window center = anchor).
      slots: [P] int32 theta-slot index per particle.
      images: [G, win, win] f32 update images (window frame, anchor at
        the center cell win//2).
      win: window size.
      l_clamp: log-odds clamp.
      frac_rc: optional [P, 2] f32 sub-cell offsets in CELLS (row, col),
        each in [-0.5, 0.5): the image lands bilinearly at
        anchor + frac instead of snapping to the anchor cell — the
        increment's centroid sits exactly at the particle's position
        (first-order-exact translation; VERDICT r2 item 3).
      ep_rows/ep_cols/ep_w: optional [P, Bpad] exact-endpoint MAP cells
        (int32) + per-beam weights (f32, 0 = masked; Bpad a multiple of
        128): fuses the exact-endpoint occupancy pass into the same
        window residency (numerics == the separate endpoint_update
        pass; pad beams with w=0).
    Returns:
      [P, Hm, Wm] updated maps (same buffer).
    """
    P, Hm, Wm = maps.shape
    G = images.shape[0]
    pad = 8
    bilinear = frac_rc is not None
    fused_ep = ep_rows is not None
    if not shared_apply_supported(Hm, Wm, win, bilinear=bilinear):
        raise ValueError(f"shared apply unsupported: {Hm}x{Wm}, win {win}")
    Rd = win + 2 * pad
    Cd = ((win + (130 if bilinear else 128) + 127) // 128) * 128
    kernel = functools.partial(
        _apply_kernel,
        win=win, pad=pad, Hm=Hm, Wm=Wm,
        l_clamp=float(l_clamp), out_dtype=maps.dtype, bilinear=bilinear,
        fused_ep=fused_ep,
    )
    n_scalars = 5 if bilinear else 3
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),    # images, resident
    ]
    ep_operands = []
    if fused_ep:
        Bpad = ep_rows.shape[1]
        assert Bpad % 128 == 0, "pad beams to a multiple of 128"
        # one [1, 1, Bpad] block per grid program (pipelined by pallas).
        # 3-D on purpose: a (1, Bpad) 2-D block violates Mosaic's
        # tiling rule (dim -2 must be 8-divisible OR equal the array
        # dim — 1 of P is neither); with the [P, 1, Bpad] layout both
        # trailing block dims equal the array dims (the pallas_corr
        # SMEM-output trick, CLAUDE.md Mosaic quirks).
        ep_spec = pl.BlockSpec((1, 1, Bpad), lambda p, *_: (p, 0, 0))
        in_specs += [ep_spec, ep_spec, ep_spec]
        ep_operands = [
            ep_rows.astype(jnp.int32)[:, None, :],
            ep_cols.astype(jnp.int32)[:, None, :],
            ep_w.astype(jnp.float32)[:, None, :],
        ]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)]   # maps stay in HBM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalars,
        grid=(P,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, Rd, Cd), maps.dtype),      # load slots
            pltpu.VMEM((2, Rd, Cd), maps.dtype),      # result slots
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    ar = anchors_rc[:, 0].astype(jnp.int32) - win // 2
    ac = anchors_rc[:, 1].astype(jnp.int32) - win // 2
    operands = [ar, ac, slots.astype(jnp.int32)]
    if bilinear:
        q = jnp.round(
            jnp.clip(frac_rc, -0.5, 0.4999) * 256.0
        ).astype(jnp.int32)                           # [P, 2] in [-128, 128)
        operands += [q[:, 0], q[:, 1]]
    # maps operand index (for aliasing): scalars + images + ep operands
    maps_idx = n_scalars + 1 + len(ep_operands)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, Hm, Wm), maps.dtype),
        input_output_aliases={maps_idx: 0},
        interpret=interpret,
    )(*operands, images, *ep_operands, maps)
