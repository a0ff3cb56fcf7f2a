"""Batched closed-form symmetric 3x3 eigendecomposition.

Replaces the reference's per-point `Eigen::SelfAdjointEigenSolver<Matrix3f>`
calls (scan_registration.cpp:207, imls_icp.cpp:776) with a fully vectorized
analytic solve: trigonometric eigenvalues plus cross-product eigenvectors.
Everything is elementwise/VPU work — no iteration, no data-dependent control
flow — so it fuses into the surrounding normal-estimation pipeline under XLA.

Convention: returns eigenvalues in DESCENDING order (lambda1 >= lambda2 >=
lambda3) with matching eigenvector columns — the order the reference exposes
after its column swap (scan_registration.cpp:221-228).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigvals3_descending(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [..., 3, 3] in descending order (analytic)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, _EPS)

    # det((A - qI) / p) / 2, expanded symbolically to stay elementwise.
    b00, b11, b22 = (a00 - q) / safe_p, (a11 - q) / safe_p, (a22 - q) / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lmax = q + 2.0 * p * jnp.cos(phi)
    lmin = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lmid = 3.0 * q - lmax - lmin
    return jnp.stack([lmax, lmid, lmin], axis=-1)


def _null_vector(M: jnp.ndarray) -> jnp.ndarray:
    """Unit vector approximately in the null space of symmetric [..., 3, 3] M.

    Uses the cross product of the pair of rows with the largest cross norm; for
    (near-)degenerate M where all crosses vanish, falls back to the coordinate
    axis most orthogonal to the dominant row.
    """
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)

    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    best_norm2 = jnp.maximum(jnp.maximum(n01, n02), n12)

    # Degenerate fallback: any unit vector orthogonal to the dominant row.
    # (Select with where, not take_along_axis: axis gathers are a slow TPU
    # path for per-row dynamic selection.)
    n0, n1, n2 = jnp.sum(r0 * r0, -1), jnp.sum(r1 * r1, -1), jnp.sum(r2 * r2, -1)
    dom = jnp.where(
        ((n0 >= n1) & (n0 >= n2))[..., None], r0,
        jnp.where((n1 >= n2)[..., None], r1, r2),
    )
    ex = jnp.zeros_like(dom).at[..., 0].set(1.0)
    ey = jnp.zeros_like(dom).at[..., 1].set(1.0)
    alt = jnp.where(
        (jnp.abs(dom[..., 0]) < 0.9)[..., None], jnp.cross(dom, ex), jnp.cross(dom, ey)
    )
    alt_norm2 = jnp.sum(alt * alt, axis=-1)
    # If even the rows vanish (M ~ 0), return ex.
    alt = jnp.where((alt_norm2 > _EPS)[..., None], alt, ex)

    v = jnp.where((best_norm2 > _EPS)[..., None], best, alt)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def eigh3_descending(A: jnp.ndarray):
    """Full eigendecomposition of symmetric [..., 3, 3].

    Returns (eigvals [..., 3] descending, eigvecs [..., 3, 3] with column k the
    eigenvector of eigvals[..., k]).
    """
    w = eigvals3_descending(A)
    eye = jnp.eye(3, dtype=A.dtype)
    vmax = _null_vector(A - w[..., 0, None, None] * eye)
    vmin = _null_vector(A - w[..., 2, None, None] * eye)
    # Fix vmin to be orthogonal to vmax even in near-degenerate cases, then
    # complete the right-handed frame.
    vmin = vmin - jnp.sum(vmin * vmax, -1, keepdims=True) * vmax
    vmin_n = jnp.linalg.norm(vmin, axis=-1, keepdims=True)
    # If vmax ~ vmin (degenerate), rebuild vmin orthogonal to vmax.
    ex = jnp.zeros_like(vmax).at[..., 0].set(1.0)
    ey = jnp.zeros_like(vmax).at[..., 1].set(1.0)
    fallback = jnp.where((jnp.abs(vmax[..., 0]) < 0.9)[..., None], jnp.cross(vmax, ex), jnp.cross(vmax, ey))
    fallback = fallback / jnp.maximum(jnp.linalg.norm(fallback, axis=-1, keepdims=True), _EPS)
    vmin = jnp.where(vmin_n > 1e-6, vmin / jnp.maximum(vmin_n, _EPS), fallback)
    vmid = jnp.cross(vmin, vmax)
    V = jnp.stack([vmax, vmid, vmin], axis=-1)
    return w, V
