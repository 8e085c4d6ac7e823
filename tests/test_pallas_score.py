"""Pallas correlation-scoring kernel vs NumPy oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from slam2d_tpu.ops.pallas_score import prep_patch_indices, score_offsets_pallas


def _oracle(S, rows, cols, wts, R, C):
    T, B = rows.shape
    out = np.zeros((T, R, C), np.float32)
    for t in range(T):
        for b in range(B):
            p = S[rows[t, b] : rows[t, b] + R + 1, cols[t, b] : cols[t, b] + C + 1]
            out[t] += (
                wts[t, b, 0] * p[:R, :C]
                + wts[t, b, 1] * p[:R, 1:]
                + wts[t, b, 2] * p[1:, :C]
                + wts[t, b, 3] * p[1:, 1:]
            )
    return out


def test_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    H = W = 96
    T, B, R, C = 4, 17, 7, 7
    S = rng.normal(size=(H, W)).astype(np.float32)
    pos_r = rng.uniform(10, 80, (T, B)).astype(np.float32)
    pos_c = rng.uniform(10, 80, (T, B)).astype(np.float32)
    valid = rng.uniform(size=B) > 0.25

    rows, cols, wts = prep_patch_indices(
        jnp.asarray(pos_r), jnp.asarray(pos_c), jnp.asarray(valid), R, C, H, W
    )
    got = np.asarray(
        score_offsets_pallas(jnp.asarray(S), rows, cols, wts, R, C, interpret=True)
    )
    exp = _oracle(S, np.asarray(rows), np.asarray(cols), np.asarray(wts), R, C)
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_edge_beams_are_masked():
    """Beams whose patch would leave the window contribute zero."""
    H = W = 32
    T, B, R, C = 1, 3, 5, 5
    S = np.ones((H, W), np.float32)
    pos_r = np.array([[1.0, 16.0, 30.5]], np.float32)  # first/last near edges
    pos_c = np.array([[16.0, 16.0, 16.0]], np.float32)
    rows, cols, wts = prep_patch_indices(
        jnp.asarray(pos_r), jnp.asarray(pos_c), jnp.ones(B, bool), R, C, H, W
    )
    w = np.asarray(wts)
    assert np.all(w[0, 0] == 0.0) and np.all(w[0, 2] == 0.0)
    got = np.asarray(
        score_offsets_pallas(jnp.asarray(S), rows, cols, wts, R, C, interpret=True)
    )
    # only the middle beam contributes; bilinear weights sum to 1 on ones
    np.testing.assert_allclose(got[0], 1.0, atol=1e-5)
