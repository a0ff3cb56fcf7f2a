"""SE(3)/SO(3) utilities shared across the pipeline.

Covers the reference's pose algebra: axis-angle -> R with SVD re-orthonormal-
ization and det fix (solver.cpp:145-158), rotation-angle-from-trace convergence
test (laser_odometry.cpp:636-638), 4x4 pose composition (laser_odometry.cpp:652),
point transforms (laser_odometry.cpp:527-549), and quaternion helpers for the
TUM-format trajectory output (saver.cpp savePoseToFile).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of v, so that hat(v) @ w = v x w.

    Matches degeneracy::VectorToSkew (degeneracy.h:8-12).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle vector -> rotation matrix (safe at ||w|| -> 0)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    axis = w / theta
    theta = theta[..., 0]
    k = hat(axis)
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + s * k + (1.0 - c) * (k @ k)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle vector (inverse of exp_so3; safe near 0)."""
    cos_theta = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    scale = jnp.where(theta > 1e-6, theta / jnp.maximum(2.0 * jnp.sin(theta), 1e-12), 0.5)
    return w * scale[..., None]


def interpolate_pose(T: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Fractional pose exp(alpha * log(T)) with linear translation and slerped
    rotation — per-point motion compensation (the proper version of the
    reference's vestigial TransformToStart, laser_odometry.cpp:62-87).
    Broadcasts over alpha [...]; returns [..., 4, 4]."""
    w = log_so3(T[:3, :3])
    R = exp_so3(alpha[..., None] * w)
    t = alpha[..., None] * T[:3, 3]
    return make_se3(R, t)


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project onto SO(3) via SVD with det fix (solver.cpp:148-158)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    u = u.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return u @ vt


def rotation_from_axis_angle(w: jnp.ndarray) -> jnp.ndarray:
    """Reference recipe: AngleAxis -> R, then SVD re-orthonormalization
    (solver.cpp:145-158). Rodrigues is already orthonormal, so the SVD is a
    numerical no-op; we keep it for bit-level robustness with tiny angles."""
    return orthonormalize(exp_so3(w))


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """|angle| from trace, clamped — the ICP convergence test
    (laser_odometry.cpp:636-638)."""
    cos_theta = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build a 4x4 homogeneous transform."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def se3_translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform to [..., N, 3] points (laser_odometry.cpp:527-539)."""
    return pts @ T[..., :3, :3].T + T[..., :3, 3]


def rotate_vectors(T: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Rotate normals without translating (laser_odometry.cpp:541-548)."""
    return vecs @ T[..., :3, :3].T


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = se3_rotation(T)
    t = se3_translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -(Rt @ t[..., None])[..., 0])


def quat_from_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), TUM order for pose files
    (saver.cpp savePoseToFile). Shepperd's branch-free formulation."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    use0 = tr > 0
    use1 = (m00 >= m11) & (m00 >= m22)
    use2 = m11 >= m22
    q = jnp.where(
        use0[..., None],
        case0(),
        jnp.where(use1[..., None], case1(), jnp.where(use2[..., None], case2(), case3())),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotation_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-12), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
        ],
        axis=-2,
    )
