"""Distributed windowed bundle adjustment / pose-graph refinement.

New first-class component (SURVEY.md §2.3, BASELINE.json north star) — the
reference integrates odometry open-loop with no refinement. Here a sliding
window of K poses is refined by Gauss-Newton over the point-to-plane
correspondences between consecutive frames:

    r_j = n_j . ( (T_k)^-1 T_{k+1} s_j - y_j )

with s_j in frame k+1, (y_j, n_j) in frame k. Pose updates are right-
perturbations T_i <- T_i exp(xi_i); the first window pose is gauge-fixed.

Distribution: correspondences shard over the mesh's point axis; each device
reduces its partial normal equations H = J^T J (6(K-1) x 6(K-1), small) and
g = J^T r, which are `psum`-reduced over the mesh (ICI traffic = one ~60x60
matrix per GN iteration), and the dense solve + pose update are replicated —
the Schur-complement trick degenerates to this dense solve because the window
is poses-only (surfels are marginalized into the correspondence sets).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plo_tpu import geometry as geo


def _residual_jacobian(T_rel, src, ref, normal, valid):
    """Residuals + Jacobian blocks for one frame pair.

    Returns (r [N], Jk [N, 6], Jk1 [N, 6]) with the 6-vector layout
    [rotation, translation] matching the solvers' convention."""
    p = geo.transform_points(T_rel, src)          # T_k^-1 T_{k+1} s, frame-k coords
    r = jnp.sum(normal * (p - ref), axis=-1)
    R_rel = T_rel[:3, :3]
    nR = normal @ R_rel                           # n^T R_rel
    # d/dxi_{k+1}: J_theta = -n^T R_rel hat(s) = (R^T n) x s ... row form:
    Jk1_theta = jnp.cross(src, nR)                # = -n^T R hat(s) rows
    Jk1_t = nR
    # d/dxi_k: J_theta = n^T hat(p), J_t = -n^T
    Jk_theta = -jnp.cross(p, normal)              # n^T hat(p) rows = (p x n)...
    Jk_t = -normal
    m = valid.astype(jnp.float32)[:, None]
    Jk = jnp.concatenate([Jk_theta, Jk_t], axis=1) * m
    Jk1 = jnp.concatenate([Jk1_theta, Jk1_t], axis=1) * m
    return r * valid.astype(jnp.float32), Jk, Jk1


def _assemble(poses, src, ref, normal, valid, k_window, pairs=None,
              huber_delta=None):
    """Full (H, g) for the window. poses [K, 4, 4]; correspondence arrays are
    [P, N, ...] for P pose pairs. Unknowns: poses 1..K-1 (pose 0 gauge-fixed).

    `pairs` is a static tuple of (i, j) pose-index pairs — src[p] lives in
    frame j's coords, (ref, normal)[p] in frame i's. Defaults to the
    consecutive chain ((0,1),(1,2),...). NOTE: a chain of consecutive pairs
    alone reproduces the per-frame ICP optima exactly (each pair term is
    independent); the window only adds information through SKIP pairs
    (e.g. (k-2, k)), which the driver records for that reason."""
    dof = 6 * (k_window - 1)
    H = jnp.zeros((dof, dof))
    g = jnp.zeros((dof,))
    if pairs is None:
        pairs = tuple((k, k + 1) for k in range(k_window - 1))

    for p, (i, j) in enumerate(pairs):
        T_rel = geo.se3_inverse(poses[i]) @ poses[j]
        r, Ji, Jj = _residual_jacobian(T_rel, src[p], ref[p], normal[p], valid[p])
        if huber_delta is not None:
            # IRLS Huber: the recorded correspondences are FROZEN assignments
            # matched at an estimated pose — a fraction lands on wrong
            # surfaces with large coherent residuals (see the frame-to-map
            # analysis), and unweighted GN absorbs that bias wholesale.
            w = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(jnp.abs(r), 1e-12)))
            r = r * w
            Ji = Ji * w[:, None]
            Jj = Jj * w[:, None]
        n = src.shape[1]
        J = jnp.zeros((n, dof))
        if i > 0:
            J = J.at[:, 6 * (i - 1):6 * i].set(Ji)
        if j > 0:
            J = J.at[:, 6 * (j - 1):6 * j].set(Jj)
        H = H + J.T @ J
        g = g + J.T @ r
    return H, g


@partial(jax.jit, static_argnames=("k_window", "iterations", "damping", "pairs",
                                   "huber_delta"))
def refine_window(poses, src, ref, normal, valid,
                  k_window: int, iterations: int = 5, damping: float = 1e-6,
                  pairs=None, huber_delta=None):
    """Gauss-Newton refinement of a K-pose window (single-device path).

    poses [K, 4, 4] f32; src/ref/normal [P, N, 3]; valid [P, N] for P pose
    pairs (default: the consecutive chain; pass skip pairs for an informative
    window — see _assemble). Returns refined poses [K, 4, 4]."""

    def step(_, poses):
        H, g = _assemble(poses, src, ref, normal, valid, k_window, pairs,
                         huber_delta)
        dof = H.shape[0]
        delta = -jnp.linalg.solve(H + damping * jnp.eye(dof), g)

        def update(i, poses):
            xi = jax.lax.dynamic_slice(delta, (6 * (i - 1),), (6,))
            Tu = poses[i] @ geo.make_se3(geo.exp_so3(xi[:3]), xi[3:6])
            return poses.at[i].set(Tu)

        return jax.lax.fori_loop(1, k_window, update, poses)

    return jax.lax.fori_loop(0, iterations, step, poses)


def make_distributed_refine(mesh: Mesh, k_window: int, iterations: int = 5,
                            axis_name: str = "points", damping: float = 1e-6,
                            pairs=None):
    """Sharded windowed BA: correspondences sharded over `axis_name`, the
    per-shard (H, g) psum-reduced, solve + update replicated."""
    from jax import shard_map

    def sharded_step(poses, src, ref, normal, valid):
        def body(poses, src_s, ref_s, normal_s, valid_s):
            def step(_, poses):
                H, g = _assemble(poses, src_s, ref_s, normal_s, valid_s,
                                 k_window, pairs)
                H = jax.lax.psum(H, axis_name)
                g = jax.lax.psum(g, axis_name)
                dof = H.shape[0]
                delta = -jnp.linalg.solve(H + damping * jnp.eye(dof), g)

                def update(i, poses):
                    xi = jax.lax.dynamic_slice(delta, (6 * (i - 1),), (6,))
                    Tu = poses[i] @ geo.make_se3(geo.exp_so3(xi[:3]), xi[3:6])
                    return poses.at[i].set(Tu)

                return jax.lax.fori_loop(1, k_window, update, poses)

            return jax.lax.fori_loop(0, iterations, step, poses)

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(None, axis_name), P(None, axis_name),
                      P(None, axis_name), P(None, axis_name)),
            out_specs=P(),
        )
        return fn(poses, src, ref, normal, valid)

    return jax.jit(sharded_step)
