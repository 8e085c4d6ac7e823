"""shared_apply_update (Pallas windowed add, in-place) vs an XLA oracle —
including map-border anchors where image cells must DROP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slam2d_tpu.ops.pallas_apply import (
    shared_apply_supported,
    shared_apply_update,
)

WIN = 64
L_CLAMP = 10.0


def oracle(maps, anchors, slots, images):
    """The XLA apply from pf/shared_update.py (clamped window + rolled,
    masked image; out-of-map image cells drop)."""
    from slam2d_tpu.grid.window import extract_window, write_window

    def one(g, anchor, img):
        gw, (r0, c0) = extract_window(g, anchor, WIN)
        dr = (anchor[0] - WIN // 2) - r0
        dc = (anchor[1] - WIN // 2) - c0
        img2 = jnp.roll(img, (dr, dc), axis=(0, 1))
        i = jnp.arange(WIN, dtype=jnp.int32)
        rmask = (i - dr >= 0) & (i - dr < WIN)
        cmask = (i - dc >= 0) & (i - dc < WIN)
        img2 = img2 * (rmask[:, None] & cmask[None, :]).astype(img2.dtype)
        gw2 = jnp.clip(
            gw.astype(jnp.float32) + img2, -L_CLAMP, L_CLAMP
        ).astype(g.dtype)
        return write_window(g, gw2, (r0, c0))

    imgs_p = images[slots]
    return jax.vmap(one)(maps, anchors, imgs_p)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_oracle_including_borders(dtype):
    P, Hm, Wm, G = 7, 256, 256, 3
    assert shared_apply_supported(Hm, Wm, WIN)
    rng = np.random.default_rng(0)
    maps = jnp.asarray(
        rng.normal(0, 2, (P, Hm, Wm)).astype(np.float32)
    ).astype(dtype)
    # corners (image partially out of map), edges, interior
    anchors = jnp.asarray(
        [[0, 0], [2, 250], [255, 255], [128, 128], [100, 3],
         [254, 30], [31, 127]], jnp.int32
    )
    slots = jnp.asarray(rng.integers(0, G, P), jnp.int32)
    images = jnp.asarray(
        rng.normal(0, 0.5, (G, WIN, WIN)).astype(np.float32)
    )

    want = np.asarray(oracle(maps, anchors, slots, images))
    got = np.asarray(
        shared_apply_update(
            maps, anchors, slots, images, WIN, L_CLAMP, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


def test_clip_binds(dtype=jnp.float32):
    P, Hm, Wm = 2, 256, 256
    maps = jnp.full((P, Hm, Wm), 9.9, dtype)
    anchors = jnp.asarray([[128, 128], [0, 255]], jnp.int32)
    slots = jnp.zeros((P,), jnp.int32)
    images = jnp.full((1, WIN, WIN), 5.0, jnp.float32)
    want = np.asarray(oracle(maps, anchors, slots, images))
    out = np.asarray(
        shared_apply_update(   # donates maps — call last
            maps, anchors, slots, images, WIN, L_CLAMP, interpret=True
        )
    )
    assert out.max() == L_CLAMP
    np.testing.assert_array_equal(out, want)
