"""Loop closure: revisit detection, keyframe re-registration, pose-graph
relaxation.

NEW capability beyond the reference (its odometry is open-loop: the
`planetary_slam` launch runs scan_registration -> laser_odometry with no
back-edge; README.md's KITTI runs accumulate drift unbounded). The building
blocks are the framework's own: revisit registration IS one back-end ICP
step (models/odometry._make_icp_step) between a revisiting frame's sampled
cloud and the revisited keyframe's model cloud, so the loop constraint is
measured by exactly the machinery whose error model the odometry edges have.

The pose-graph relax runs on the HOST in float64 — deliberately: the graph
is tiny (6N x 6N with N = trajectory length; ~1600 unknowns for a 272-frame
run), the driver's pose chain is already host-f64 (models/odometry.py
integrates in f64 for the same conditioning reason), and f32 TPU linear
solves at mm-level over hundred-meter trajectories would eat the signal.
Decoupled SO(3) x R^3 residuals with first-order Jacobians (standard
pose-graph practice); Gauss-Newton re-evaluates residuals exactly each
iteration, so the approximate Jacobians only affect convergence rate.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def detect_revisits(positions: np.ndarray, min_gap: int = 40,
                    radius: float = 3.0, min_spacing: int = 20
                    ) -> List[Tuple[int, int]]:
    """Candidate loop pairs (i, j), i + min_gap <= j, ||p_i - p_j|| < radius.

    Greedy: for each j (in order) the CLOSEST qualifying i is taken, and
    further candidates within `min_spacing` frames of an accepted j are
    skipped — one closure per revisit event, not one per frame driven
    through the revisited region."""
    p = np.asarray(positions, np.float64)
    n = len(p)
    pairs: List[Tuple[int, int]] = []
    last_j = -10**9
    for j in range(min_gap, n):
        if j - last_j < min_spacing:
            continue
        d = np.linalg.norm(p[: j - min_gap + 1] - p[j], axis=1)
        i = int(np.argmin(d))
        if d[i] < radius:
            pairs.append((i, j))
            last_j = j
    return pairs


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _log_so3(R):
    c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-9:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                         R[1, 0] - R[0, 1]]) / 2.0
    return th / (2.0 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])


def _exp_so3(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3) + _skew(w)
    K = _skew(w / th)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def pose_graph_optimize(poses: np.ndarray,
                        edges: List[Tuple[int, int, np.ndarray, float]],
                        iterations: int = 15,
                        damping: float = 1e-6) -> np.ndarray:
    """Relax [N, 4, 4] world poses against relative-pose edges
    (i, j, rel_meas 4x4 with X_i @ rel = X_j, weight).

    Decoupled residuals per edge:
      r_R = log(R_rel^T R_i^T R_j)          (rotation, rad)
      r_t = R_i^T (t_j - t_i) - t_rel       (translation, m)
    Right-perturbation first-order Jacobians; node 0 is gauge-fixed."""
    X = np.array(poses, np.float64, copy=True)
    n = len(X)

    for _ in range(iterations):
        H = np.zeros((6 * n, 6 * n))
        b = np.zeros(6 * n)
        for (i, j, rel, w) in edges:
            Ri, ti = X[i, :3, :3], X[i, :3, 3]
            Rj, tj = X[j, :3, :3], X[j, :3, 3]
            Rrel, trel = rel[:3, :3], rel[:3, 3]
            r_R = _log_so3(Rrel.T @ Ri.T @ Rj)
            dt = Ri.T @ (tj - ti)
            r_t = dt - trel
            # Jacobian blocks [r_R; r_t] w.r.t. (w_i, t_i, w_j, t_j).
            Ji = np.zeros((6, 6))
            Jj = np.zeros((6, 6))
            Ji[:3, :3] = -np.eye(3)           # d r_R / d w_i
            Jj[:3, :3] = np.eye(3)            # d r_R / d w_j
            Ji[3:, :3] = _skew(dt)            # d r_t / d w_i
            Ji[3:, 3:] = -Ri.T                # d r_t / d t_i
            Jj[3:, 3:] = Ri.T                 # d r_t / d t_j
            r = np.concatenate([r_R, r_t])
            for (a, Ja) in ((i, Ji), (j, Jj)):
                b[6 * a: 6 * a + 6] += w * Ja.T @ r
                for (c, Jc) in ((i, Ji), (j, Jj)):
                    H[6 * a: 6 * a + 6, 6 * c: 6 * c + 6] += w * Ja.T @ Jc
        # Gauge: clamp node 0.
        H[:6, :] = 0.0
        H[:, :6] = 0.0
        H[:6, :6] = np.eye(6)
        b[:6] = 0.0
        H += damping * np.eye(6 * n)
        dx = np.linalg.solve(H, -b)
        for k in range(n):
            w_k, t_k = dx[6 * k: 6 * k + 3], dx[6 * k + 3: 6 * k + 6]
            X[k, :3, :3] = X[k, :3, :3] @ _exp_so3(w_k)
            X[k, :3, 3] += t_k  # global-frame delta (matches d r_t/d t_j = R_i^T)
        if np.linalg.norm(dx) < 1e-10:
            break
        # Re-orthonormalize (accumulated exp-map roundoff).
        for k in range(n):
            u, _, vt = np.linalg.svd(X[k, :3, :3])
            X[k, :3, :3] = u @ np.diag([1, 1, np.linalg.det(u @ vt)]) @ vt
    return X


def close_loops(cfg, scans, poses: np.ndarray,
                keyframe_every: int = 8, min_gap: int = 40,
                radius: float = 3.0, capacity: int = 57600,
                transfer_seed: int = 0, loop_weight: float = 10.0,
                max_pairs: int = 8, min_corr: int = 50):
    """Detect revisits in an odometry trajectory, re-register each revisit
    pair with the back-end ICP (sampled cloud of frame j against the model
    cloud of frame i, initialized at the odometry relative pose), and relax
    the full pose graph (odometry edges from the estimated rels + measured
    loop edges). Returns (corrected_poses [N, 4, 4], loop_edges) where
    loop_edges = [(i, j, rel 4x4, n_corr)]."""
    from plo_tpu.models.odometry import _cached_frontend, _cached_icp_step

    poses = np.asarray(poses, np.float64)
    pairs = detect_revisits(poses[:, :3, 3], min_gap=min_gap, radius=radius)
    pairs = pairs[:max_pairs]
    if not pairs:
        return poses.copy(), []

    frontend = _cached_frontend(cfg, capacity)
    icp_step = _cached_icp_step(cfg)
    key = jax.random.PRNGKey(transfer_seed)

    # Front-end each needed frame ONCE (pairs share frames rarely, but a
    # revisited keyframe can anchor several closures).
    needed = sorted({i for i, _ in pairs} | {j for _, j in pairs})
    fe_cache = {}
    for idx, f in enumerate(needed):
        # first_frame=True: the frame-1 sampling fallback (normal binning for
        # major_axis configs) — keyframes are recomputed standalone, with no
        # previous-frame cloud for the cylinder-weighted sampler to scan.
        # Any valid sampled subset serves loop registration equally.
        fe_cache[f] = frontend.process(scans[f], jax.random.fold_in(key, idx),
                                       None, first_frame=True)

    loop_edges = []
    for pi, (i, j) in enumerate(pairs):
        init = jnp.asarray(
            (np.linalg.inv(poses[i]) @ poses[j]).astype(np.float32))
        rel, iters, ncorr, converged, _ = icp_step(
            fe_cache[j].flat, fe_cache[i].filtered,
            jax.random.fold_in(key, 1000 + pi), init)
        ncorr = int(ncorr)
        if ncorr < min_corr or not bool(converged):
            continue
        loop_edges.append((i, j, np.asarray(rel, np.float64), ncorr))
    if not loop_edges:
        return poses.copy(), []

    edges = []
    for k in range(len(poses) - 1):
        rel = np.linalg.inv(poses[k]) @ poses[k + 1]
        edges.append((k, k + 1, rel, 1.0))
    for (i, j, rel, _n) in loop_edges:
        edges.append((i, j, rel, loop_weight))

    corrected = pose_graph_optimize(poses, edges)
    return corrected, loop_edges
