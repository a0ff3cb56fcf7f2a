"""Point-to-point ICP on matched pair sets
(SolveMotionEstimationProblemICP, solver.cpp:387-434).

The reference hands *already paired* clouds to pcl::IterativeClosestPoint,
which internally re-associates by nearest neighbor each iteration. Here the
same procedure runs on device: NN association (exact chunked search) + SVD
(Umeyama/Kabsch) alignment, for a fixed iteration budget. The reference's
epsilon parameters are declared `const int` (solver.h:121-122) so 1e-8
truncates to 0 — i.e. no epsilon-based early stop; we run the fixed budget
(capped for compile-time sanity; pcl converges in far fewer).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from plo_tpu import geometry as geo
from plo_tpu.ops import neighbors


@jax.jit
def umeyama(source: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray):
    """Weighted Kabsch/Umeyama alignment of paired sets (no scale).
    Returns (R, t) minimizing sum w_i ||R s_i + t - t_i||^2."""
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.sum(source * w[:, None], axis=0)
    mu_t = jnp.sum(target * w[:, None], axis=0)
    sc = source - mu_s
    tc = target - mu_t
    H = (sc * w[:, None]).T @ tc
    u, _, vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(vt.T @ u.T)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.where(
        jnp.arange(3) == 2, jnp.where(d < 0, -1.0, 1.0), 1.0))
    R = vt.T @ S @ u.T
    t = mu_t - R @ mu_s
    return R, t


@partial(jax.jit, static_argnames=("max_iterations",))
def solve_icp_point_to_point(source, ref, valid, max_iterations: int = 20):
    """Returns (deltaTrans 4x4, ok bool)."""

    def body(_, state):
        R, t = state
        moved = source @ R.T + t
        _, idx, found = neighbors.nearest(moved, ref, valid)
        matched = ref[jnp.clip(idx, 0, ref.shape[0] - 1)]
        w = (valid & found).astype(jnp.float32)
        dR, dt = umeyama(moved, matched, w)
        return dR @ R, dR @ t + dt

    R0 = jnp.eye(3, dtype=jnp.float32)
    t0 = jnp.zeros((3,), jnp.float32)
    R, t = jax.lax.fori_loop(0, max_iterations, body, (R0, t0))
    ok = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t)) & (jnp.sum(valid.astype(jnp.int32)) >= 3)
    R = jnp.where(ok, R, jnp.eye(3, dtype=jnp.float32))
    t = jnp.where(ok, t, 0.0)
    return geo.make_se3(R, t), ok
