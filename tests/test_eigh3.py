import numpy as np
import jax.numpy as jnp

from plo_tpu.ops import eigh3


def random_symmetric(rng, n):
    A = rng.normal(size=(n, 3, 3))
    return (A + np.swapaxes(A, -1, -2)) / 2


def check_decomposition(A, w, V, atol=1e-4):
    # Descending eigenvalues.
    assert np.all(np.diff(np.asarray(w), axis=-1) <= 1e-4)
    # A V = V diag(w)
    lhs = A @ np.asarray(V)
    rhs = np.asarray(V) * np.asarray(w)[:, None, :]
    np.testing.assert_allclose(lhs, rhs, atol=atol)
    # Orthonormal columns.
    VtV = np.swapaxes(np.asarray(V), -1, -2) @ np.asarray(V)
    np.testing.assert_allclose(VtV, np.tile(np.eye(3), (A.shape[0], 1, 1)), atol=atol)


def test_eigvals_match_numpy(rng):
    A = random_symmetric(rng, 256)
    w = np.asarray(eigh3.eigvals3_descending(jnp.asarray(A)))
    w_np = np.linalg.eigvalsh(A)[..., ::-1]
    np.testing.assert_allclose(w, w_np, atol=1e-4)


def test_eigenvectors_random(rng):
    A = random_symmetric(rng, 256)
    w, V = eigh3.eigh3_descending(jnp.asarray(A))
    check_decomposition(A, w, V)


def test_planar_covariances(rng):
    # Covariances of planar point sets: lambda3 << lambda1, lambda2.
    pts = rng.normal(size=(64, 50, 3))
    pts[..., 2] *= 1e-3
    c = pts - pts.mean(axis=1, keepdims=True)
    cov = np.einsum("bni,bnj->bij", c, c) / 49
    w, V = eigh3.eigh3_descending(jnp.asarray(cov))
    check_decomposition(cov, w, V, atol=1e-4)
    # Normal (min eigvec) should be near +-z.
    nz = np.abs(np.asarray(V)[:, 2, 2])
    assert np.all(nz > 0.999)


def test_degenerate_isotropic():
    A = np.tile(np.eye(3) * 2.0, (4, 1, 1))
    w, V = eigh3.eigh3_descending(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(w), 2.0, atol=1e-5)
    VtV = np.swapaxes(np.asarray(V), -1, -2) @ np.asarray(V)
    np.testing.assert_allclose(VtV, np.tile(np.eye(3), (4, 1, 1)), atol=1e-4)


def test_degenerate_two_equal(rng):
    # lambda1 == lambda2 > lambda3 (disk-like).
    Q = np.linalg.qr(rng.normal(size=(16, 3, 3)))[0]
    w_true = np.array([2.0, 2.0, 0.5])
    A = np.einsum("bij,j,bkj->bik", Q, w_true, Q)
    w, V = eigh3.eigh3_descending(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(w), np.tile(w_true, (16, 1)), atol=1e-3)
    check_decomposition(A, w, V, atol=1e-3)


def test_zero_matrix():
    A = np.zeros((2, 3, 3))
    w, V = eigh3.eigh3_descending(jnp.asarray(A))
    assert np.all(np.isfinite(np.asarray(w)))
    assert np.all(np.isfinite(np.asarray(V)))
