"""On-chip parity check of the bilinear shared-apply kernel variant vs
the XLA fallback blend (CLAUDE.md rule: interpret-mode Pallas passing on
CPU proves nothing about Mosaic lowering — validate every new kernel
variant on the real chip before trusting its ATE).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_check_bilinear.py
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from slam2d_tpu.ops.pallas_apply import shared_apply_update


def main():
    rng = np.random.default_rng(0)
    P, H, W, win, G = 16, 512, 512, 256, 8
    maps = jnp.asarray(
        rng.normal(0, 0.5, (P, H, W)).astype(np.float32)
    ).astype(jnp.bfloat16)
    images = jnp.asarray(
        rng.normal(0, 0.3, (G, win, win)).astype(np.float32)
    ).astype(jnp.bfloat16)
    anchors = jnp.asarray(
        np.stack([rng.integers(140, 360, P), rng.integers(140, 360, P)], 1),
        jnp.int32,
    )
    slots = jnp.asarray(rng.integers(0, G, P), jnp.int32)
    frac = jnp.asarray(rng.uniform(-0.5, 0.4999, (P, 2)).astype(np.float32))
    print(f"backend={jax.default_backend()}", flush=True)

    for name, fr in (("snapped", None), ("bilinear", frac)):
        on_chip = np.asarray(shared_apply_update(
            jnp.array(maps), anchors, slots, images, win, 10.0,
            interpret=False, frac_rc=fr,
        ), np.float32)
        interp = np.asarray(shared_apply_update(
            jnp.array(maps), anchors, slots, images, win, 10.0,
            interpret=True, frac_rc=fr,
        ), np.float32)
        d = np.abs(on_chip - interp)
        print(json.dumps({
            "variant": name,
            "max_abs_diff_chip_vs_interpret": float(d.max()),
            "cells_differing": int((d > 1e-3).sum()),
        }), flush=True)
        assert d.max() < 2e-2, (name, float(d.max()))
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
