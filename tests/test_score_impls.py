"""All scoring kernels agree (gather / mxu / emx / pallas-interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam2d_tpu.match.correlative import score_offsets


def _inputs(seed=3, T=3, B=24, H=96, W=96):
    rng = np.random.default_rng(seed)
    S = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    prior = jnp.asarray([2.0, 2.2, 0.3], jnp.float32)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (B, 2)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=B) > 0.2)
    dthetas = jnp.asarray(np.linspace(-0.15, 0.15, T), jnp.float32)
    offs = jnp.arange(-3, 4, dtype=jnp.int32)
    origin = jnp.asarray([-2.0, -2.0], jnp.float32)
    return S, prior, pts, valid, dthetas, offs, origin


@pytest.mark.parametrize("bilinear", [False, True])
def test_three_impls_agree(bilinear):
    S, prior, pts, valid, dthetas, offs, origin = _inputs()
    out = {}
    for impl in ("gather", "mxu", "emx", "pallas", "cmx"):
        out[impl] = np.asarray(
            score_offsets(
                S, prior, pts, valid, dthetas, offs, offs, 0.1, origin,
                bilinear=bilinear, impl=impl, use_bf16=False,
            )
        )
    np.testing.assert_allclose(out["mxu"], out["gather"], atol=2e-4)
    np.testing.assert_allclose(out["emx"], out["mxu"], atol=2e-4)
    np.testing.assert_allclose(out["pallas"], out["gather"], atol=2e-4)
    np.testing.assert_allclose(out["cmx"], out["emx"], atol=2e-4)
