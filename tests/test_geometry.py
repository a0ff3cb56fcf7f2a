import numpy as np
import jax.numpy as jnp

from plo_tpu import geometry as geo


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(geo.rotation_from_quat(jnp.asarray(q)))


def test_exp_so3_matches_scipy_style(rng):
    w = rng.normal(size=(32, 3))
    R = np.asarray(geo.exp_so3(jnp.asarray(w)))
    # Orthonormal, det 1
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Angle round trip
    ang = np.asarray(geo.rotation_angle(jnp.asarray(R)))
    np.testing.assert_allclose(ang, np.linalg.norm(w, axis=-1) % (2 * np.pi) * 0 + np.minimum(np.linalg.norm(w, axis=-1) % (2 * np.pi), 2 * np.pi - np.linalg.norm(w, axis=-1) % (2 * np.pi)), atol=1e-4)


def test_exp_so3_small_angle():
    R = np.asarray(geo.exp_so3(jnp.zeros((1, 3))))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


def test_quat_round_trip(rng):
    R = random_rotations(rng, 64)
    q = np.asarray(geo.quat_from_rotation(jnp.asarray(R)))
    R2 = np.asarray(geo.rotation_from_quat(jnp.asarray(q)))
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_se3_compose_inverse(rng):
    R = random_rotations(rng, 8)
    t = rng.normal(size=(8, 3))
    T = np.asarray(geo.make_se3(jnp.asarray(R), jnp.asarray(t)))
    Tinv = np.asarray(geo.se3_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(T @ Tinv, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_transform_points(rng):
    R = random_rotations(rng, 1)[0]
    t = rng.normal(size=(3,))
    T = np.asarray(geo.make_se3(jnp.asarray(R), jnp.asarray(t)))
    pts = rng.normal(size=(100, 3))
    out = np.asarray(geo.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-5)


def test_orthonormalize_det_fix(rng):
    M = rng.normal(size=(16, 3, 3))
    R = np.asarray(geo.orthonormalize(jnp.asarray(M)))
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
