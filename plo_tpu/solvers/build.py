"""Shared linearized point-to-plane system builder (solver.cpp:89-104).

Row i of A is [n.z s.y - n.y s.z, n.x s.z - n.z s.x, n.y s.x - n.x s.y,
n.x, n.y, n.z] = [(s x n)^T, n^T]; b_i = n . (d - s). Invalid correspondences
contribute all-zero rows (A row and b zeroed), which leave any least-squares
solution unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from plo_tpu import geometry as geo


@jax.jit
def build_system(source: jnp.ndarray, ref: jnp.ndarray, normal: jnp.ndarray,
                 valid: jnp.ndarray):
    """Returns (A [N, 6], b [N]) with invalid rows zeroed."""
    s, d, n = source, ref, normal
    a_rot = jnp.stack(
        [
            n[:, 2] * s[:, 1] - n[:, 1] * s[:, 2],
            n[:, 0] * s[:, 2] - n[:, 2] * s[:, 0],
            n[:, 1] * s[:, 0] - n[:, 0] * s[:, 1],
        ],
        axis=1,
    )
    A = jnp.concatenate([a_rot, n], axis=1)
    b = jnp.sum(n * (d - s), axis=1)
    m = valid[:, None].astype(A.dtype)
    return A * m, b * valid.astype(b.dtype)


@jax.jit
def masked_lstsq(A: jnp.ndarray, b: jnp.ndarray, rcond: float = 1e-6) -> jnp.ndarray:
    """Least-squares solve of a (row-masked) tall system via SVD pseudo-inverse
    with a singular-value cutoff — avoids the condition-number squaring of
    normal equations in f32 AND stays finite on rank-deficient systems
    (degenerate geometry zeroes the unobservable components, the effective
    behavior of the reference's pivoted-QR solve on [N, 6], solver.cpp:107)."""
    u, s, vt = jnp.linalg.svd(A, full_matrices=False)
    cutoff = rcond * jnp.max(s)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    return vt.T @ (s_inv * (u.T @ b))


def se3_from_x(x: jnp.ndarray) -> jnp.ndarray:
    """6-vector [rotation axis-angle, translation] -> 4x4 transform with the
    reference's SVD-orthonormalized rotation (solver.cpp:140-163)."""
    R = geo.rotation_from_axis_angle(x[:3])
    return geo.make_se3(R, x[3:6])
