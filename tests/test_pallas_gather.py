"""Pallas DMA row gather for resampling (ops/pallas_gather.py)."""

import numpy as np

import jax.numpy as jnp

from slam2d_tpu.ops.pallas_gather import gather_rows_pallas


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    for P, shape in [(16, (16, 32, 128)), (8, (8, 96, 288)), (12, (12, 1000))]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        anc = jnp.asarray(rng.integers(0, P, P), jnp.int32)
        got = np.asarray(gather_rows_pallas(x, anc, interpret=True))
        np.testing.assert_array_equal(got, np.asarray(x)[np.asarray(anc)])


def test_gather_rows_bf16_and_identity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64, 128)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ident = jnp.arange(8, dtype=jnp.int32)
    got = gather_rows_pallas(x, ident, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(x.astype(jnp.float32)),
    )
    # duplicated ancestors (weight collapse): every row = row 3
    anc = jnp.full((8,), 3, jnp.int32)
    got = np.asarray(gather_rows_pallas(x, anc, interpret=True)
                     .astype(jnp.float32))
    np.testing.assert_array_equal(
        got, np.tile(np.asarray(x.astype(jnp.float32))[3][None], (8, 1, 1))
    )
