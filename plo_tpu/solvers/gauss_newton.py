"""Huber-robust Gauss-Newton point-to-plane solver — the TPU equivalent of the
reference's Ceres path (SolveMotionEstimationProblemCeres, solver.cpp:25-72):
quaternion-parameterized point-to-plane residuals n^T (R s + t - y) under
HuberLoss(0.1), DENSE_QR, max_num_iterations from config.

Here the same cost is minimized by IRLS Gauss-Newton with a left-multiplied
axis-angle increment — a fixed-iteration loop with static shapes (no Ceres
line search; the problem is small and nearly quadratic, 20 GN steps >> Ceres'
convergence point).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from plo_tpu import geometry as geo

HUBER_DELTA = 0.1  # solver.cpp:46


@partial(jax.jit, static_argnames=("max_iterations",))
def solve_gauss_newton(source, ref, normal, valid, max_iterations: int = 20):
    """Returns (deltaTrans 4x4, ok bool)."""
    w_valid = valid.astype(jnp.float32)

    def step(_, state):
        R, t = state
        rs = source @ R.T
        r = jnp.sum(normal * (rs + t - ref), axis=1)  # residuals
        absr = jnp.abs(r)
        huber_w = jnp.where(absr <= HUBER_DELTA, 1.0, HUBER_DELTA / jnp.maximum(absr, 1e-12))
        w = huber_w * w_valid

        j_rot = jnp.cross(rs, normal)   # d r / d omega (left perturbation)
        J = jnp.concatenate([j_rot, normal], axis=1)  # [N, 6]
        JW = J * w[:, None]
        H = JW.T @ J + 1e-8 * jnp.eye(6)
        g = JW.T @ r
        dx = -jnp.linalg.solve(H, g)
        R_new = geo.exp_so3(dx[:3]) @ R
        return R_new, t + dx[3:6]

    R0 = jnp.eye(3, dtype=jnp.float32)
    t0 = jnp.zeros((3,), jnp.float32)
    R, t = jax.lax.fori_loop(0, max_iterations, step, (R0, t0))
    ok = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t)) & (jnp.sum(valid.astype(jnp.int32)) >= 3)
    R = jnp.where(ok, R, jnp.eye(3, dtype=jnp.float32))
    t = jnp.where(ok, t, 0.0)
    return geo.make_se3(R, t), ok
