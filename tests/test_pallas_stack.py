"""Golden test: the Pallas shift-stack expansion must equal the XLA
pad+crop form bit-for-bit (pure data movement, no arithmetic)."""

import jax.numpy as jnp
import numpy as np

from slam2d_tpu.ops.pallas_stack import shift_stack_pallas, stack_supported


def _xla_stack(E, R, C):
    return jnp.stack(
        [
            jnp.pad(E, ((0, 0), (dr, 0), (dc, 0)))[:, : E.shape[1], : E.shape[2]]
            for dr in range(R)
            for dc in range(C)
        ],
        axis=1,
    )


def test_stack_matches_xla_form():
    rng = np.random.default_rng(0)
    G, win, R, C = 3, 64, 5, 5
    E = jnp.asarray(rng.normal(size=(G, win, win)).astype(np.float32))
    assert stack_supported(win, R, C, 4)
    got = shift_stack_pallas(E, R, C, interpret=True)
    want = _xla_stack(E, R, C)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_stack_bf16_and_asymmetric():
    rng = np.random.default_rng(1)
    G, win, R, C = 2, 48, 3, 7
    E = jnp.asarray(
        rng.normal(size=(G, win, win)).astype(np.float32)
    ).astype(jnp.bfloat16)
    got = shift_stack_pallas(E, R, C, interpret=True)
    want = _xla_stack(E, R, C)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_unsupported_shapes_gate():
    # odd window (not 8-aligned) and oversized VMEM both refuse
    assert not stack_supported(65, 5, 5, 4)
    assert not stack_supported(512, 11, 11, 4)
