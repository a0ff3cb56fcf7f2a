"""Batched RANSAC point-to-plane solver
(SolveMotionEstimationProblemRANSAC, solver.cpp:222-385).

The reference's sequential loop (FPS-3 seed -> 3x6 solve -> inlier count ->
early exit at min_inliers_percentage) is re-architected as one batched
computation: all `max_iterations` hypotheses are seeded, solved, and scored in
parallel, and the early-exit semantics are recovered exactly with a prefix
cumulative-max: the winner is the running best at the first index where the
running best exceeds min_inliers (or the global argmax when none does) — the
same hypothesis the sequential loop would return.

Hypothesis seeding replicates FPS-3 (common.cpp:19-85): a keyed random first
point, then two farthest-first picks — each hypothesis gets an independent
first pick, and the two argmax steps are batched [M, N] reductions.

Deviation: the reference solves the underdetermined 3x6 seed system with
Eigen's colPivHouseholderQr (a pivoted basic solution); here the minimum-norm
solution A^T (A A^T)^-1 b is used. Individual hypothesis transforms differ,
but both satisfy the 3 constraints and RANSAC selects by inlier count, so the
statistics (and the refit, which dominates accuracy) match.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from plo_tpu import geometry as geo
from plo_tpu.solvers.build import build_system
from plo_tpu.solvers.drpm import solve_drpm
from plo_tpu.solvers.ls import solve_ls_trimmed, solve_weighted_ls


def _fps23_from_firsts(xyz: jnp.ndarray, valid: jnp.ndarray, firsts: jnp.ndarray):
    """Farthest-first picks 2 and 3 for given first picks [M]. Each
    hypothesis is independent, so this can be evaluated on any SLICE of the
    hypothesis stream (the staged early-exit path scores a prefix first)
    and produce bit-identical seeds to the full batch."""
    n = xyz.shape[0]
    # Squared distances via the matmul form: FPS argmax picks are invariant
    # under the monotonic square, and far-apart seeds make the f32
    # cancellation error (~1e-3 m^2 at 100 m) irrelevant — so the [M,N]
    # matrices come from one MXU matmul each instead of [M,N,3] diff tensors.
    big_neg = -jnp.inf
    x2 = jnp.sum(xyz * xyz, axis=-1)                                   # [N]
    def sqdist(pts):  # [M,3] -> [M,N]
        return jnp.maximum(jnp.sum(pts * pts, -1)[:, None] - 2.0 * (pts @ xyz.T) + x2[None, :], 0.0)

    d1 = sqdist(xyz[firsts])
    d1 = jnp.where(valid[None, :], d1, big_neg)
    d1 = jnp.where(jnp.arange(n)[None, :] == firsts[:, None], big_neg, d1)
    seconds = jnp.argmax(d1, axis=1)

    d2 = sqdist(xyz[seconds])
    min_d = jnp.minimum(d1, jnp.where(valid[None, :], d2, big_neg))
    min_d = jnp.where(jnp.arange(n)[None, :] == seconds[:, None], big_neg, min_d)
    thirds = jnp.argmax(min_d, axis=1)
    return jnp.stack([firsts, seconds.astype(jnp.int32), thirds.astype(jnp.int32)], axis=1)


def _fps3_batched(xyz: jnp.ndarray, valid: jnp.ndarray, key: jnp.ndarray, m: int):
    """FPS with 3 samples, batched over m hypotheses. Returns idx [M, 3]."""
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    order = jnp.argsort(~valid, stable=True)
    firsts = order[jax.random.randint(key, (m,), 0, n_valid)]  # [M]
    return _fps23_from_firsts(xyz, valid, firsts)


@jax.jit
def _solve_seed(A3: jnp.ndarray, b3: jnp.ndarray):
    """Min-norm solution of the 3x6 seed system (vmapped over hypotheses).
    The 3x3 Gram solve uses the closed-form adjugate inverse — pure
    elementwise math that batches over 1000 hypotheses without the generic
    LU path (measured ~8x faster than jnp.linalg.solve here)."""
    G = A3 @ A3.T + 1e-9 * jnp.eye(3)
    c00 = G[1, 1] * G[2, 2] - G[1, 2] * G[2, 1]
    c01 = G[1, 2] * G[2, 0] - G[1, 0] * G[2, 2]
    c02 = G[1, 0] * G[2, 1] - G[1, 1] * G[2, 0]
    det = G[0, 0] * c00 + G[0, 1] * c01 + G[0, 2] * c02
    adj = jnp.array(
        [[c00, G[0, 2] * G[2, 1] - G[0, 1] * G[2, 2], G[0, 1] * G[1, 2] - G[0, 2] * G[1, 1]],
         [c01, G[0, 0] * G[2, 2] - G[0, 2] * G[2, 0], G[0, 2] * G[1, 0] - G[0, 0] * G[1, 2]],
         [c02, G[0, 1] * G[2, 0] - G[0, 0] * G[2, 1], G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]]])
    lam = adj @ b3 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    return A3.T @ lam


@partial(jax.jit, static_argnames=("max_iterations", "hyp_chunk"))
def _score_hypotheses(source, ref, normal, valid, R_all, t_all,
                      distance_threshold: float, max_iterations: int,
                      hyp_chunk: int = 0):
    """Inlier counts for all hypotheses, chunked over hypotheses."""
    m = max_iterations
    if hyp_chunk <= 0:
        # One matmul when the [M, N] score matrix fits comfortably (<=512 MB
        # f32): at RANSAC-5000 x 6400 correspondences the single-chunk form
        # replaces 10 launch-bound small matmuls with one MXU pass.
        hyp_chunk = m if m * source.shape[0] <= 2048 * 65536 else 500
    n_chunks = -(-m // hyp_chunk)
    pad = n_chunks * hyp_chunk - m
    Rp = jnp.concatenate([R_all, jnp.tile(jnp.eye(3)[None], (pad, 1, 1))]).reshape(
        n_chunks, hyp_chunk, 3, 3)
    tp = jnp.concatenate([t_all, jnp.zeros((pad, 3))]).reshape(n_chunks, hyp_chunk, 3)

    # dist_{mp} = |(R_m s_p + t_m - ref_p) . n_p| = |<R_m, n_p s_p^T> + t_m.n_p - ref_p.n_p|
    # — two MXU matmuls ([M,9]x[9,N] and [M,3]x[3,N]), no [M,N,3] tensor.
    P = jnp.einsum("ni,nj->nij", normal, source).reshape(-1, 9).T   # [9, N]
    c = jnp.sum(ref * normal, axis=-1)                              # [N]

    def body(_, inputs):
        Rc, tc = inputs
        term = Rc.reshape(-1, 9) @ P + tc @ normal.T - c[None, :]
        cnt = jnp.sum((jnp.abs(term) < distance_threshold) & valid[None, :], axis=1)
        return None, cnt

    _, counts = jax.lax.scan(body, None, (Rp, tp))
    return counts.reshape(-1)[:m]


@partial(jax.jit, static_argnames=("max_iterations", "final_solve_method",
                                   "return_probs", "stage"))
def solve_ransac(source, ref, normal, valid, key,
                 max_iterations: int, distance_threshold: float,
                 min_inliers_percentage: float, huber_threshold: float,
                 final_solve_method: str, ls_threshold: float,
                 drpm_threshold: float, drpm_stdev_points: float,
                 drpm_stdev_normals: float, return_probs: bool = False,
                 stage: int = 256):
    """Returns (deltaTrans 4x4, ok bool); with return_probs=True additionally
    the DRPM [6] signal-to-noise non-degeneracy probabilities (ones when the
    final solve is not DRPM) — the vector the reference prints every solve
    (solver.cpp:559-563)."""
    n = source.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    min_inliers = (min_inliers_percentage * n_valid.astype(jnp.float32)).astype(jnp.int32)

    # The full hypothesis STREAM's first picks are drawn up front (one cheap
    # randint) so staged evaluation below sees the identical stream.
    order = jnp.argsort(~valid, stable=True)
    firsts = order[jax.random.randint(key, (max_iterations,), 0, n_valid)]
    A_full, b_full = build_system(source, ref, normal, valid)

    def hypotheses(f):
        seeds = _fps23_from_firsts(source, valid, f)
        x = jax.vmap(_solve_seed)(A_full[seeds], b_full[seeds])
        # Rodrigues output is already orthonormal; the reference's SVD fix
        # (solver.cpp:284-293) is a numerical no-op, and 1000+ vmapped 3x3
        # SVDs are measurable on TPU — apply it only in the final solves.
        return geo.exp_so3(x[:, :3]), x[:, 3:6]

    def pick(counts, R_all, t_all, m):
        # Sequential early-exit semantics, batched (solver.cpp:316-326): the
        # winner is the running best at the first index where the running
        # best exceeds min_inliers (global argmax when none does).
        running_best = jax.lax.cummax(counts)
        exceeded = running_best > min_inliers
        any_exceeded = jnp.any(exceeded)
        stop_idx = jnp.where(any_exceeded, jnp.argmax(exceeded), m - 1)
        prefix_mask = jnp.arange(m) <= stop_idx
        masked_counts = jnp.where(prefix_mask, counts, -1)
        best = jnp.argmax(masked_counts)  # first max within the prefix
        return R_all[best], t_all[best]

    # --- staged evaluation: the reference's sequential loop usually exits
    # within its first few hypotheses (min_inliers reached immediately once
    # the pose is near-aligned). Stage A generates + scores only the first W
    # hypotheses; if ANY exceeds min_inliers, the sequential winner provably
    # lies inside the prefix and stage B (the remaining M-W) is never
    # executed (lax.cond runs one branch on TPU) — bit-identical results at
    # ~M/W of the hypothesis cost in the common case. stage=0 forces the
    # unstaged single pass (the parity oracle in tests/test_solvers.py). ---
    W = stage
    if W <= 0 or max_iterations <= 2 * W:
        R_all, t_all = hypotheses(firsts)
        counts = _score_hypotheses(source, ref, normal, valid, R_all, t_all,
                                   distance_threshold, max_iterations)
        R_best, t_best = pick(counts, R_all, t_all, max_iterations)
    else:
        R_a, t_a = hypotheses(firsts[:W])
        counts_a = _score_hypotheses(source, ref, normal, valid, R_a, t_a,
                                     distance_threshold, W)
        stage_a_wins = jnp.any(counts_a > min_inliers)

        def stage_a():
            return pick(counts_a, R_a, t_a, W)

        def full():
            R_b, t_b = hypotheses(firsts[W:])
            counts_b = _score_hypotheses(
                source, ref, normal, valid, R_b, t_b,
                distance_threshold, max_iterations - W)
            return pick(jnp.concatenate([counts_a, counts_b]),
                        jnp.concatenate([R_a, R_b]),
                        jnp.concatenate([t_a, t_b]), max_iterations)

        R_best, t_best = jax.lax.cond(stage_a_wins, stage_a, full)

    # --- inlier refit with exp-Huber weights (solver.cpp:328-364) ---
    tr = source @ R_best.T + t_best
    dist = jnp.abs(jnp.sum((tr - ref) * normal, axis=-1))
    inlier = valid & (dist < distance_threshold)
    h2 = huber_threshold * distance_threshold
    e = jnp.exp(-dist)
    w = jnp.where(jnp.sqrt(e) < h2, e, 2.0 * h2 * jnp.sqrt(e) - h2 * h2)
    w = jnp.where(inlier, w, 0.0)
    wsum = jnp.sum(w)
    w = jnp.where(wsum > 0, w / jnp.maximum(wsum, 1e-20), w)

    probs = jnp.ones((6,), jnp.float32)
    if final_solve_method == "LS":
        T, ok = solve_ls_trimmed(source, ref, normal, inlier, ls_threshold)
    elif final_solve_method == "Weighted LS":
        T, ok = solve_weighted_ls(source, ref, normal, inlier, w)
    elif final_solve_method == "DRPM":
        T, ok, probs = solve_drpm(source, ref, normal, inlier, w,
                                  drpm_threshold, drpm_stdev_points, drpm_stdev_normals)
    else:
        raise ValueError(f"invalid RANSAC final_solve_method {final_solve_method!r}")
    ok = ok & (n_valid >= 3)
    return (T, ok, probs) if return_probs else (T, ok)
