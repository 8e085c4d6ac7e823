"""Pallas VMEM blur (ops/pallas_blur.py) vs the XLA shift-and-add blur."""

import numpy as np
import jax
import jax.numpy as jnp

from slam2d_tpu.match.correlative import _gaussian_kernel_1d
from slam2d_tpu.ops.pallas_blur import separable_blur_pallas


def _xla_blur(img, k):
    hw = len(k) // 2

    def blur_axis(x, axis):
        size = x.shape[axis]
        pad = [(0, 0), (0, 0)]
        pad[axis] = (hw, hw)
        xp = jnp.pad(x, pad)
        acc = None
        for i, kv in enumerate(k):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(i, i + size)
            term = float(kv) * xp[tuple(sl)]
            acc = term if acc is None else acc + term
        return acc

    return blur_axis(blur_axis(img, 0), 1)


def test_matches_xla_blur():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (96, 160)).astype(np.float32))
    k = _gaussian_kernel_1d(1.0, 4)
    a = np.asarray(_xla_blur(img, k))
    b = np.asarray(
        separable_blur_pallas(img, tuple(float(v) for v in k), interpret=True)
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_odd_sizes_and_vmap():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(0, 1, (3, 72, 136)).astype(np.float32))
    k = _gaussian_kernel_1d(1.5, 5)
    a = np.asarray(jax.vmap(lambda x: _xla_blur(x, k))(imgs))
    b = np.asarray(
        jax.vmap(
            lambda x: separable_blur_pallas(
                x, tuple(float(v) for v in k), interpret=True
            )
        )(imgs)
    )
    np.testing.assert_allclose(a, b, atol=1e-5)
