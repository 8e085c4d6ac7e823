import jax.numpy as jnp
import numpy as np

from slam2d_tpu.core import se2


def rand_pose(rng):
    return jnp.asarray(
        [rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(-np.pi, np.pi)],
        dtype=jnp.float32,
    )


def test_compose_inverse_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rand_pose(rng)
        ident = se2.compose(a, se2.inverse(a))
        np.testing.assert_allclose(np.asarray(ident), np.zeros(3), atol=1e-5)


def test_between_recovers_delta():
    rng = np.random.default_rng(1)
    a = rand_pose(rng)
    d = rand_pose(rng)
    b = se2.compose(a, d)
    np.testing.assert_allclose(np.asarray(se2.between(a, b)), np.asarray(d), atol=1e-5)


def test_compose_matches_matrix_form():
    rng = np.random.default_rng(2)
    a, b = rand_pose(rng), rand_pose(rng)

    def mat(p):
        c, s = np.cos(p[2]), np.sin(p[2])
        return np.array([[c, -s, p[0]], [s, c, p[1]], [0, 0, 1]])

    m = mat(np.asarray(a)) @ mat(np.asarray(b))
    got = np.asarray(se2.compose(a, b))
    np.testing.assert_allclose(got[:2], m[:2, 2], atol=1e-5)
    np.testing.assert_allclose(
        [np.cos(got[2]), np.sin(got[2])], [m[0, 0], m[1, 0]], atol=1e-5
    )


def test_transform_points():
    pose = jnp.asarray([1.0, 2.0, np.pi / 2], jnp.float32)
    pts = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    out = np.asarray(se2.transform_points(pose, pts))
    np.testing.assert_allclose(out, [[1.0, 3.0], [0.0, 2.0]], atol=1e-5)


def test_wrap_angle():
    assert abs(float(se2.wrap_angle(jnp.asarray(3 * np.pi)))) - np.pi < 1e-5
    np.testing.assert_allclose(float(se2.wrap_angle(jnp.asarray(-0.1))), -0.1, atol=1e-6)
