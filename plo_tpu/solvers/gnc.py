"""TEASER-style robust registration — the reference's TEASER++ solver slot
(SolveMotionEstimationProblemTeaser, solver.cpp:436-483).

The reference's Teaser path is marked broken/unverified (results.png), but the
config surface promises the full pipeline, so this module implements the
TEASER structure TPU-natively rather than a bare GNC loop:

  1. (optional, estimate_scaling) scale from translation-invariant
     measurements: robust median of ||TIM_ref|| / ||TIM_src|| over sampled
     correspondence pairs;
  2. (optional, use_max_clique) inlier pruning on the TIM consistency graph —
     edge (i, j) iff | ||s_i-s_j|| - ||r_i-r_j|| | <= 2*noise_bound. TEASER
     approximates max-clique by a k-core heuristic (kcore_heuristic_threshold,
     teaser::RobustRegistrationSolver); here the maximum non-empty k-core is
     found by binary search over k with an iterative peeling fixpoint — pure
     [N, N] masked matvecs, no graph library;
  3. GNC-TLS alignment (Yang et al.) on the surviving set: graduated
     non-convexity with a truncated-least-squares cost, implemented as a
     fixed-iteration reweighted-Umeyama loop.

Config mapping: noise_bound -> TLS epsilon + graph gate; rotation_gnc_factor
-> mu schedule; rotation_max_iterations -> iteration cap (compile-time
capped); use_max_clique/kcore_heuristic_threshold/estimate_scaling as above.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from plo_tpu import geometry as geo
from plo_tpu.solvers.icp_umeyama import umeyama


def _consistency_kcore(source, ref, valid, noise_bound, peel_iters: int = 12):
    """Maximum non-empty k-core of the TIM consistency graph.

    Returns a bool [N] inlier mask. Binary search over k (7 rounds covers
    N <= 128k); each probe peels vertices with in-core degree < k to a
    fixpoint. Every step is a masked [N, N] @ [N] matvec — MXU work."""
    n = source.shape[0]
    ds = jnp.linalg.norm(source[:, None, :] - source[None, :, :], axis=-1)
    dr = jnp.linalg.norm(ref[:, None, :] - ref[None, :, :], axis=-1)
    vv = valid[:, None] & valid[None, :]
    adj = (jnp.abs(ds - dr) <= 2.0 * noise_bound) & vv
    adj = adj & ~jnp.eye(n, dtype=bool)
    adj_f = adj.astype(jnp.float32)

    def core_nonempty(k):
        def peel(_, keep):
            deg = adj_f @ keep
            return keep * (deg >= k).astype(jnp.float32)
        keep = jax.lax.fori_loop(0, peel_iters, peel, valid.astype(jnp.float32))
        return keep

    # Binary search the largest k with a non-empty k-core.
    def body(_, state):
        lo, hi, best = state  # invariant: lo-core non-empty, hi-core empty
        mid = (lo + hi) // 2
        keep = core_nonempty(mid.astype(jnp.float32))
        nonempty = jnp.sum(keep) > 0
        lo2 = jnp.where(nonempty, mid, lo)
        hi2 = jnp.where(nonempty, hi, mid)
        best2 = jnp.where(nonempty, keep, best)
        return lo2, hi2, best2

    init = (jnp.asarray(1, jnp.int32), jnp.asarray(n, jnp.int32),
            core_nonempty(1.0))
    _, _, best = jax.lax.fori_loop(0, 17, body, init)
    return best > 0.5


def _estimate_scale(source, ref, valid, key, n_pairs: int = 1024):
    """TEASER's scale estimate: robust median of TIM-norm ratios over sampled
    correspondence pairs (teaser::ScalarTLSEstimator, median flavor)."""
    n = source.shape[0]
    ka, kb = jax.random.split(key)
    ia = jax.random.randint(ka, (n_pairs,), 0, n)
    ib = jax.random.randint(kb, (n_pairs,), 0, n)
    ok = valid[ia] & valid[ib] & (ia != ib)
    ns = jnp.linalg.norm(source[ia] - source[ib], axis=-1)
    nr = jnp.linalg.norm(ref[ia] - ref[ib], axis=-1)
    ratio = jnp.where(ok & (ns > 1e-6), nr / jnp.maximum(ns, 1e-6), jnp.nan)
    # masked median via sort (NaNs sort last)
    srt = jnp.sort(ratio)
    count = jnp.sum(jnp.isfinite(ratio))
    med = srt[jnp.clip((count - 1) // 2, 0, n_pairs - 1)]
    return jnp.where(count >= 3, med, 1.0)


def _umeyama_yaw(source, ref, w):
    """Weighted yaw-only (quasi-SO(3)) alignment: rotation restricted to the
    z axis + full 3-DoF translation. The closed form is the weighted 2-D
    Procrustes angle theta = atan2(sum w (sx*ry - sy*rx),
    sum w (sx*rx + sy*ry)) over centered pairs."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(source * w[:, None], axis=0) / wsum
    mu_r = jnp.sum(ref * w[:, None], axis=0) / wsum
    s = source - mu_s
    r = ref - mu_r
    num = jnp.sum(w * (s[:, 0] * r[:, 1] - s[:, 1] * r[:, 0]))
    den = jnp.sum(w * (s[:, 0] * r[:, 0] + s[:, 1] * r[:, 1]))
    theta = jnp.arctan2(num, jnp.where(jnp.abs(den) > 1e-20, den, 1e-20))
    c, sn = jnp.cos(theta), jnp.sin(theta)
    R = jnp.array([[c, -sn, 0.0], [sn, c, 0.0], [0.0, 0.0, 1.0]])
    t = mu_r - R @ mu_s
    return R, t


@partial(jax.jit, static_argnames=("max_iterations", "use_max_clique",
                                   "estimate_scaling", "algorithm"))
def solve_gnc_tls(source, ref, valid, noise_bound: float = 0.01,
                  gnc_factor: float = 1.4, max_iterations: int = 64,
                  use_max_clique: bool = False,
                  kcore_min_fraction: float = 0.0,
                  estimate_scaling: bool = False,
                  key=None,
                  algorithm: str = "GNC_TLS",
                  cost_threshold: float = 0.0):
    """Returns (deltaTrans 4x4, ok bool). With use_max_clique, the TIM
    consistency k-core prunes gross outliers before the GNC loop (falling
    back to the unpruned set when the core is a sub-`kcore_min_fraction`
    sliver, mirroring TEASER's kcore_heuristic_threshold semantics).

    `algorithm` selects the rotation estimator, mapping TEASER's
    ROTATION_ESTIMATION_ALGORITHM enum (solver.h:51-62, stringToTeaserEnum):
      * GNC_TLS — graduated truncated least squares (mu annealed UP);
      * FGR    — graduated Geman-McClure (Zhou et al.; control parameter
                 annealed DOWN by gnc_factor, w = (mu*eps2/(mu*eps2+r2))^2);
      * QUATRO — quasi-SO(3): GNC-TLS weights but the alignment step solves
                 yaw-only rotation + translation (Lim et al.) — immune to
                 roll/pitch corruption from degenerate vertical structure.
    `cost_threshold` (the config's rotation_cost_threshold) stops the loop
    when the weighted TLS cost changes by less than the threshold between
    iterations (TEASER's cost-convergence test); 0 disables (fixed count)."""
    eps2 = jnp.maximum(noise_bound**2, 1e-12)
    base_w = valid.astype(jnp.float32)

    scale = 1.0
    if estimate_scaling:
        if key is None:
            key = jax.random.PRNGKey(0)
        scale = _estimate_scale(source, ref, valid, key)
    src = source * scale

    if use_max_clique:
        core = _consistency_kcore(src, ref, valid, noise_bound)
        n_core = jnp.sum(core.astype(jnp.float32))
        n_valid = jnp.maximum(jnp.sum(base_w), 1.0)
        use_core = (n_core >= 3) & (n_core / n_valid >= kcore_min_fraction)
        base_w = jnp.where(use_core, core.astype(jnp.float32) * base_w, base_w)

    align = _umeyama_yaw if algorithm == "QUATRO" else umeyama

    # Initial alignment + control-parameter init from the max residual.
    R, t = align(src, ref, base_w + 1e-9)
    r2 = jnp.sum((src @ R.T + t - ref) ** 2, axis=-1)
    r2_max = jnp.maximum(jnp.max(jnp.where(base_w > 0, r2, 0.0)), eps2)
    if algorithm == "FGR":
        mu0 = r2_max / eps2  # Geman-McClure: start near-convex, anneal DOWN
    else:
        mu0 = jnp.maximum(1.0 / (2.0 * r2_max / eps2 - 1.0), 1e-6)

    def weights(r2, mu):
        if algorithm == "FGR":
            m = mu * eps2
            return (m / (m + r2)) ** 2
        up = (mu + 1.0) / mu * eps2
        lo = mu / (mu + 1.0) * eps2
        w = jnp.where(r2 <= lo, 1.0, jnp.where(r2 >= up, 0.0,
                      jnp.sqrt(eps2 * mu * (mu + 1.0) / jnp.maximum(r2, 1e-20)) - mu))
        return jnp.clip(w, 0.0, 1.0)

    iters = min(max_iterations, 64)

    def cond(state):
        i, done, *_ = state
        return (i < iters) & ~done

    def body(state):
        i, _, R, t, mu, prev_cost = state
        r2 = jnp.sum((src @ R.T + t - ref) ** 2, axis=-1)
        w = weights(r2, mu) * base_w
        R2, t2 = align(src, ref, w + 1e-9)
        # Weighted truncated cost (TEASER's convergence observable).
        cost = jnp.sum(w * jnp.minimum(r2, eps2))
        done = (cost_threshold > 0.0) & (jnp.abs(cost - prev_cost) < cost_threshold)
        if algorithm == "FGR":
            mu2 = jnp.maximum(mu / gnc_factor, 1.0)
        else:
            mu2 = mu * gnc_factor
        return i + 1, done, R2, t2, mu2, cost

    state = (jnp.asarray(0, jnp.int32), jnp.asarray(False), R, t, mu0,
             jnp.asarray(jnp.inf, jnp.float32))
    _, _, R, t, _, _ = jax.lax.while_loop(cond, body, state)
    ok = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t)) & (jnp.sum(valid.astype(jnp.int32)) >= 3)
    R = jnp.where(ok, R, jnp.eye(3, dtype=jnp.float32))
    t = jnp.where(ok, t, 0.0)
    # The solved transform maps ORIGINAL source coords: fold the scale into R.
    return geo.make_se3(R * scale, t), ok