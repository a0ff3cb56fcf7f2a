"""Degeneracy-aware probabilistic solver — DRPM
(SolveMotionEstimationProblemDRPM, solver.cpp:499-603; degeneracy.h:5-131).

Pipeline: weighted H = A^T W A -> 6x6 eigendecomposition -> per-eigenvector
noise mean/variance from isotropic point/normal noise models -> signal-to-noise
probability via the Gaussian CDF (snr_factor = 10) -> if the least-probable
direction falls below threshold, solve with the probability-weighted
pseudo-inverse x = U diag(p_k / lambda_k) U^T A^T W b; otherwise plain
weighted LS.

The reference's per-point 6x6 loop (degeneracy.h:33-69) is one batched einsum
here; boost::math::cdf becomes jax.scipy.stats.norm.cdf.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from plo_tpu import geometry as geo
from plo_tpu.solvers.build import build_system, masked_lstsq, se3_from_x

SNR_FACTOR = 10.0  # solver.cpp:547


@jax.jit
def compute_noise_estimate_dense(points, normals, weights, valid, U,
                                 stdev_points, stdev_normals):
    """degeneracy::ComputeNoiseEstimate (degeneracy.h:14-72) via the literal
    per-point 6x6 tensors — the reference's formulation, kept as the oracle
    for `compute_noise_estimate` (tests/test_solvers.py)."""
    w = weights * valid.astype(jnp.float32)
    nx = geo.hat(normals)                 # [N, 3, 3]
    px = geo.hat(points)                  # [N, 3, 3]

    B = jnp.zeros(points.shape[:1] + (6, 6), jnp.float32)
    B = B.at[:, 0:3, 0:3].set(-nx)
    B = B.at[:, 0:3, 3:6].set(px @ nx)
    B = B.at[:, 3:6, 3:6].set(nx)

    Ncov = jnp.zeros_like(B)
    Ncov = Ncov.at[:, 0:3, 0:3].set(jnp.eye(3) * stdev_points**2)
    Ncov = Ncov.at[:, 3:6, 3:6].set(jnp.eye(3) * stdev_normals**2)

    contrib = jnp.einsum("nij,njk,nlk->nil", B, Ncov, B) * w[:, None, None]
    mean = jnp.sum(contrib, axis=0)

    sw = jnp.sqrt(w)
    v = jnp.concatenate(
        [sw[:, None] * jnp.einsum("nij,nj->ni", px, normals), sw[:, None] * normals],
        axis=1,
    )  # [N, 6]

    # Per direction k: a = u^T C_n u, b = u^T v_n; var_k += 2a^2 + 4ab^2.
    a = jnp.einsum("ik,nij,jk->nk", U, contrib, U)  # [N, 6]
    bb = v @ U                                      # [N, 6]
    var = jnp.sum(2.0 * a * a + 4.0 * a * bb * bb, axis=0)
    return mean, var


@jax.jit
def compute_noise_estimate(points, normals, weights, valid, U,
                           stdev_points, stdev_normals):
    """degeneracy::ComputeNoiseEstimate (degeneracy.h:14-72), closed form.

    The reference builds per-point 6x6 tensors B_n Ncov B_n^T. With
    B = [[-hat(n), hat(p) hat(n)], [0, hat(n)]] and the constant block-diagonal
    Ncov = diag(sp^2 I, sn^2 I), every block of the weighted sum reduces to
    3x3 moment sums over {n, p, p x n} — hat(n) hat(n)^T = |n|^2 I - n n^T,
    hat(p) (nn^T) hat(p)^T = (p x n)(p x n)^T, hat(p) nn^T = (p x n) n^T —
    so the [N,6,6] tensor never materializes (measured 26x faster on TPU,
    identical values: test_noise_estimate_closed_form).

    Returns (mean [6, 6], variance [6])."""
    w = weights * valid.astype(jnp.float32)
    sp2 = stdev_points**2
    sn2 = stdev_normals**2
    p = points
    n = normals
    pxn = jnp.cross(p, n)                       # hat(p) n
    n2 = jnp.sum(n * n, axis=-1)                # |n|^2
    p2 = jnp.sum(p * p, axis=-1)

    wn2 = w * n2
    S_w_n2 = jnp.sum(wn2)
    S_nnT = jnp.einsum("n,ni,nj->ij", w, n, n)
    M_sum = S_w_n2 * jnp.eye(3) - S_nnT                       # sum w (|n|^2 I - nn^T)

    S_n2p2 = jnp.sum(wn2 * p2)
    S_n2_ppT = jnp.einsum("n,ni,nj->ij", wn2, p, p)
    S_pxn_pxnT = jnp.einsum("n,ni,nj->ij", w, pxn, pxn)
    TL2 = S_n2p2 * jnp.eye(3) - S_n2_ppT - S_pxn_pxnT         # sum w hat(p) M hat(p)^T

    S_n2_p = jnp.einsum("n,ni->i", wn2, p)
    S_pxn_nT = jnp.einsum("n,ni,nj->ij", w, pxn, n)
    TR = sn2 * (geo.hat(S_n2_p[None])[0] - S_pxn_nT)          # sum w hat(p) M

    mean = jnp.zeros((6, 6), jnp.float32)
    mean = mean.at[0:3, 0:3].set(sp2 * M_sum + sn2 * TL2)
    mean = mean.at[0:3, 3:6].set(TR)
    mean = mean.at[3:6, 0:3].set(TR.T)
    mean = mean.at[3:6, 3:6].set(sn2 * M_sum)

    # Variance: a_{nk} = u_k^T (w_n B Ncov B^T) u_k with u_k = [u1; u2]:
    #   a/w = sp2 (u1^T M u1) + sn2 (c^T M c + 2 c^T M u2 + u2^T M u2),
    # where c = hat(p)^T u1 = -(p x u1) and x^T M y = |n|^2 (x.y) - (n.x)(n.y).
    u1 = U[0:3, :]                               # [3, 6]
    u2 = U[3:6, :]
    ndot1 = n @ u1                               # [N, 6]
    ndot2 = n @ u2
    c = -jnp.cross(p[:, None, :], u1.T[None, :, :])   # [N, 6, 3]
    ndotc = jnp.einsum("nki,ni->nk", c, n)
    c2 = jnp.sum(c * c, axis=-1)
    cdotu2 = jnp.einsum("nki,ik->nk", c, u2)
    u1sq = jnp.sum(u1 * u1, axis=0)[None, :]     # [1, 6]
    u2sq = jnp.sum(u2 * u2, axis=0)[None, :]
    n2c = n2[:, None]
    quad = (sp2 * (n2c * u1sq - ndot1**2)
            + sn2 * ((n2c * c2 - ndotc**2)
                     + 2.0 * (n2c * cdotu2 - ndotc * ndot2)
                     + (n2c * u2sq - ndot2**2)))
    a = w[:, None] * quad                        # [N, 6]

    sw = jnp.sqrt(w)
    v = jnp.concatenate([sw[:, None] * pxn, sw[:, None] * n], axis=1)  # [N, 6]
    bb = v @ U
    var = jnp.sum(2.0 * a * a + 4.0 * a * bb * bb, axis=0)
    return mean, var


@jax.jit
def signal_to_noise_probabilities(H, noise_mean, noise_var, U):
    """degeneracy::ComputeSignalToNoiseProbabilities (degeneracy.h:74-105)."""
    measurement = jnp.einsum("ik,ij,jk->k", U, H, U)
    expected_noise = jnp.einsum("ik,ij,jk->k", U, noise_mean, U)
    stdev = jnp.sqrt(jnp.maximum(noise_var, 0.0))
    test_point = measurement / (1.0 + SNR_FACTOR)
    prob = norm.cdf(test_point, loc=expected_noise, scale=jnp.maximum(stdev, 1e-20))
    bad = ~(jnp.isfinite(expected_noise) & jnp.isfinite(stdev) & jnp.isfinite(test_point))
    return jnp.where(bad, 0.0, prob)


@partial(jax.jit, static_argnames=("robust",))
def estimate_normal(points, st_dev_point, robust: bool = False):
    """degeneracy::EstimateNormal (degeneracy.h:134-170) — plane-fit normal
    with uncertainty. Unused by the reference pipeline (SURVEY.md §1
    vestigial surface) but part of the degeneracy namespace's public API.

    points: [N, 3] (the reference takes a fixed-size 3xN Eigen matrix).
    Returns (normal [3], variance, distance_to_origin, covariance_of_normal
    [3, 3]). Batch over point sets with jax.vmap.
    """
    n = points.shape[0]
    mean = jnp.mean(points, axis=0)
    cov = points.T @ points / n - jnp.outer(mean, mean)
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending, as Eigen's solver
    normal = eigvecs[:, 0]
    mid, mx = eigvals[1], eigvals[2]
    if robust:
        mid = jnp.maximum(mid - st_dev_point**2, 1e-7)
        mx = jnp.maximum(mx - st_dev_point**2, 1e-7)
    variance = st_dev_point**2 / (n * mid)
    distance_to_origin = normal @ mean
    d = jnp.stack([jnp.zeros(()), 1.0 / mid, 1.0 / mx])
    cov_normal = st_dev_point**2 / n * (eigvecs * d[None, :]) @ eigvecs.T
    return normal, variance, distance_to_origin, cov_normal


@jax.jit
def solve_drpm(source, ref, normal, valid, weights,
               threshold: float, stdev_points: float, stdev_normals: float):
    """Returns (deltaTrans 4x4, ok bool, probabilities [6])."""
    A, b = build_system(source, ref, normal, valid)
    sw = jnp.sqrt(jnp.maximum(weights, 0.0)) * valid.astype(jnp.float32)
    Aw = A * sw[:, None]
    bw = b * sw

    # Eigen-structure of H = Aw^T Aw via the SVD of Aw: lambda = sigma^2 and
    # U = right singular vectors. Forming H explicitly and eigendecomposing it
    # in f32 squares the condition number and destroys the small-eigenvalue
    # directions the SNR pseudo-inverse divides by; the SVD keeps them at f32
    # relative accuracy. Ordered ascending to match Eigen's SelfAdjointEigenSolver.
    W, sig, vt = jnp.linalg.svd(Aw, full_matrices=False)
    order = jnp.argsort(sig)  # ascending eigenvalues
    sig = sig[order]
    U = vt.T[:, order]
    W = W[:, order]
    eigvals = sig * sig
    H = (U * eigvals[None, :]) @ U.T

    noise_mean, noise_var = compute_noise_estimate(
        source, normal, weights, valid, U, stdev_points, stdev_normals
    )
    probs = signal_to_noise_probabilities(H, noise_mean, noise_var, U)

    # SNR pseudo-inverse solve (degeneracy.h:107-131):
    # x = U diag(p/lambda) U^T A^T b = U diag(p/sigma) W^T b.
    wb = W.T @ bw
    d_psinv = jnp.where(eigvals > 1e-10, probs / jnp.maximum(sig, 1e-20), 0.0)
    x_snr = U @ (d_psinv * wb)
    x_wls = masked_lstsq(Aw, bw)

    degenerate = jnp.min(probs) < threshold
    x = jnp.where(degenerate, x_snr, x_wls)
    ok = jnp.all(jnp.isfinite(x)) & (jnp.sum(valid.astype(jnp.int32)) >= 3)
    x = jnp.where(ok, x, 0.0)
    return se3_from_x(x), ok, probs
