import pytest
import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import norm as scipy_norm

from plo_tpu import geometry as geo
from plo_tpu import solvers
from plo_tpu.solvers import drpm


def planar_problem(rng, n=500, angle=0.01, trans=0.05, noise=0.0, n_outliers=0):
    """Random correspondences consistent with a known small motion: ref points
    are source points moved by (R, t) then 'observed' on planes with normals n."""
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * angle
    R = np.asarray(geo.exp_so3(jnp.asarray(w[None])))[0]
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t) * trans

    s = (rng.random((n, 3)) - 0.5) * 40
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    moved = s @ R.T + t
    # Choose d so the plane constraint holds exactly: d = moved + noise in-plane
    d = moved + noise * rng.normal(size=(n, 3)) * 0.01
    if n_outliers:
        out = rng.choice(n, n_outliers, replace=False)
        d[out] += rng.normal(size=(n_outliers, 3)) * 5.0
    valid = np.ones(n, bool)
    return (s.astype(np.float32), d.astype(np.float32), normals.astype(np.float32),
            valid, R, t)


def check_transform(T, R, t, atol=1e-3):
    T = np.asarray(T)
    np.testing.assert_allclose(T[:3, :3], R, atol=atol)
    np.testing.assert_allclose(T[:3, 3], t, atol=atol)


def test_build_system_oracle(rng):
    s, d, n, valid, _, _ = planar_problem(rng, n=50)
    A, b = solvers.build_system(jnp.asarray(s), jnp.asarray(d), jnp.asarray(n), jnp.asarray(valid))
    A = np.asarray(A)
    i = 7
    row = [n[i, 2] * s[i, 1] - n[i, 1] * s[i, 2],
           n[i, 0] * s[i, 2] - n[i, 2] * s[i, 0],
           n[i, 1] * s[i, 0] - n[i, 0] * s[i, 1],
           n[i, 0], n[i, 1], n[i, 2]]
    np.testing.assert_allclose(A[i], row, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b)[i], n[i] @ (d[i] - s[i]), atol=1e-5)


def test_ls_trimmed_recovers_motion(rng):
    s, d, n, valid, R, t = planar_problem(rng)
    T, ok = solvers.solve_ls_trimmed(jnp.asarray(s), jnp.asarray(d), jnp.asarray(n),
                                     jnp.asarray(valid), 0.02)
    assert bool(ok)
    check_transform(T, R, t)


def test_ls_masked_rows_ignored(rng):
    s, d, n, valid, R, t = planar_problem(rng)
    # Corrupt half the correspondences but mask them out.
    d2 = d.copy()
    d2[250:] += 100.0
    valid2 = valid.copy()
    valid2[250:] = False
    T, ok = solvers.solve_ls_trimmed(jnp.asarray(s), jnp.asarray(d2), jnp.asarray(n),
                                     jnp.asarray(valid2), 0.02)
    check_transform(T, R, t)


def test_weighted_ls(rng):
    s, d, n, valid, R, t = planar_problem(rng)
    w = np.ones(len(s), np.float32) / len(s)
    T, ok = solvers.solve_weighted_ls(jnp.asarray(s), jnp.asarray(d), jnp.asarray(n),
                                      jnp.asarray(valid), jnp.asarray(w))
    assert bool(ok)
    check_transform(T, R, t)


def test_gauss_newton_matches_ls_on_clean_problem(rng):
    s, d, n, valid, R, t = planar_problem(rng, angle=0.05, trans=0.2)
    T, ok = solvers.solve_gauss_newton(jnp.asarray(s), jnp.asarray(d), jnp.asarray(n),
                                       jnp.asarray(valid), max_iterations=20)
    assert bool(ok)
    check_transform(T, R, t, atol=2e-3)


def test_ransac_rejects_outliers(rng):
    s, d, n, valid, R, t = planar_problem(rng, n=600, n_outliers=200)
    key = jax.random.PRNGKey(0)
    T, ok = solvers.solve_ransac(
        jnp.asarray(s), jnp.asarray(d), jnp.asarray(n), jnp.asarray(valid), key,
        max_iterations=200, distance_threshold=0.1, min_inliers_percentage=0.6,
        huber_threshold=0.648, final_solve_method="LS", ls_threshold=0.02,
        drpm_threshold=0.05, drpm_stdev_points=0.02, drpm_stdev_normals=0.05)
    assert bool(ok)
    check_transform(T, R, t, atol=5e-3)


def test_ransac_drpm_final(rng):
    s, d, n, valid, R, t = planar_problem(rng, n=400, n_outliers=50)
    key = jax.random.PRNGKey(1)
    T, ok = solvers.solve_ransac(
        jnp.asarray(s), jnp.asarray(d), jnp.asarray(n), jnp.asarray(valid), key,
        max_iterations=100, distance_threshold=0.2, min_inliers_percentage=0.8,
        huber_threshold=0.648, final_solve_method="DRPM", ls_threshold=0.02,
        drpm_threshold=0.05, drpm_stdev_points=0.02, drpm_stdev_normals=0.05)
    assert bool(ok)
    check_transform(T, R, t, atol=5e-3)


def test_drpm_probabilities_oracle(rng):
    """Non-degenerate, well-conditioned problems should yield p ~ 1 in every
    direction; the CDF must match scipy's."""
    s, d, n, valid, R, t = planar_problem(rng)
    w = np.ones(len(s), np.float32) / len(s)
    T, ok, probs = solvers.solve_drpm(jnp.asarray(s), jnp.asarray(d), jnp.asarray(n),
                                      jnp.asarray(valid), jnp.asarray(w),
                                      0.05, 0.02, 0.05)
    assert bool(ok)
    probs = np.asarray(probs)
    assert probs.shape == (6,)
    assert (probs > 0.99).all()
    check_transform(T, R, t, atol=2e-3)


def test_drpm_detects_degeneracy(rng):
    """All normals parallel to z: translation in x/y is unobservable -> some
    probabilities must collapse and the SNR solve path engages."""
    n_pts = 400
    s = (rng.random((n_pts, 3)) - 0.5) * 40
    normals = np.tile(np.array([0.0, 0, 1.0], np.float32), (n_pts, 1))
    t = np.array([0.0, 0.0, 0.05])
    d = s + t
    valid = np.ones(n_pts, bool)
    w = np.ones(n_pts, np.float32) / n_pts
    T, ok, probs = solvers.solve_drpm(jnp.asarray(s.astype(np.float32)), jnp.asarray(d.astype(np.float32)),
                                      jnp.asarray(normals), jnp.asarray(valid), jnp.asarray(w),
                                      0.05, 0.02, 0.05)
    probs = np.asarray(probs)
    assert probs.min() < 0.05  # degenerate directions detected
    T = np.asarray(T)
    # The observable component (z translation) must still be recovered.
    np.testing.assert_allclose(T[2, 3], 0.05, atol=5e-3)
    assert np.all(np.isfinite(T))


def test_norm_cdf_matches_scipy():
    x = np.linspace(-3, 3, 13)
    got = np.asarray(jax.scipy.stats.norm.cdf(jnp.asarray(x), loc=0.5, scale=2.0))
    np.testing.assert_allclose(got, scipy_norm.cdf(x, loc=0.5, scale=2.0), atol=1e-6)


def test_umeyama_exact(rng):
    s = rng.random((100, 3)).astype(np.float32) * 10
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(geo.rotation_from_quat(jnp.asarray(q)))
    t = rng.normal(size=3)
    d = s @ R.T + t
    Rh, th = solvers.umeyama(jnp.asarray(s), jnp.asarray(d.astype(np.float32)),
                             jnp.ones(100, jnp.float32))
    np.testing.assert_allclose(np.asarray(Rh), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(th), t, atol=1e-3)


def test_icp_point_to_point(rng):
    s = rng.random((300, 3)).astype(np.float32) * 20
    w = np.array([0.0, 0.0, 0.02])
    R = np.asarray(geo.exp_so3(jnp.asarray(w[None])))[0]
    t = np.array([0.1, -0.05, 0.02])
    d = (s @ R.T + t).astype(np.float32)
    T, ok = solvers.solve_icp_point_to_point(jnp.asarray(s), jnp.asarray(d),
                                             jnp.ones(300, bool), max_iterations=10)
    assert bool(ok)
    check_transform(T, R, t, atol=1e-2)


def test_gnc_tls_robust(rng):
    s = rng.random((300, 3)).astype(np.float32) * 20
    w = np.array([0.0, 0.0, 0.05])
    R = np.asarray(geo.exp_so3(jnp.asarray(w[None])))[0]
    t = np.array([0.3, -0.1, 0.05])
    d = (s @ R.T + t)
    d[:60] += rng.normal(size=(60, 3)) * 3.0  # 20% outliers
    T, ok = solvers.solve_gnc_tls(jnp.asarray(s), jnp.asarray(d.astype(np.float32)),
                                  jnp.ones(300, bool), noise_bound=0.05)
    assert bool(ok)
    check_transform(T, R, t, atol=2e-2)


def test_estimate_normal_plane_fit():
    """degeneracy::EstimateNormal (degeneracy.h:134-170): plane-fit normal,
    variance, origin distance, and normal covariance vs float64 oracle."""
    rng = np.random.default_rng(5)
    n = 64
    pts = np.zeros((n, 3))
    pts[:, 0] = rng.uniform(-2, 2, n)
    pts[:, 1] = rng.uniform(-1, 1, n)
    pts[:, 2] = 3.0 + 0.01 * rng.standard_normal(n)
    nrm, var, dist, cov = drpm.estimate_normal(jnp.asarray(pts, jnp.float32), 0.01)
    nrm, var, dist, cov = map(np.asarray, (nrm, var, dist, cov))

    mean = pts.mean(axis=0)
    c = pts.T @ pts / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(c)
    want_n = v[:, 0]
    assert abs(abs(nrm @ want_n) - 1.0) < 1e-3
    assert abs(abs(nrm[2]) - 1.0) < 1e-2  # plane is ~horizontal
    np.testing.assert_allclose(var, 0.01**2 / (n * w[1]), rtol=1e-2)
    np.testing.assert_allclose(dist, nrm @ mean, rtol=1e-4, atol=1e-5)
    want_cov = 0.01**2 / n * v @ np.diag([0.0, 1 / w[1], 1 / w[2]]) @ v.T
    np.testing.assert_allclose(cov, want_cov, atol=1e-5)

    # robust=True subtracts the noise floor from the eigenvalues
    _, var_r, _, _ = drpm.estimate_normal(jnp.asarray(pts, jnp.float32), 0.01, robust=True)
    assert float(var_r) >= float(var) - 1e-12


def test_noise_estimate_closed_form(rng):
    """Closed-form moment-sum ComputeNoiseEstimate == the literal per-point
    6x6 formulation (degeneracy.h:14-72), including non-unit normals and
    masked points."""
    n_pts = 257
    p = (rng.random((n_pts, 3)) - 0.5) * 60
    n = rng.standard_normal((n_pts, 3)) * 1.1  # deliberately non-unit
    w = rng.random(n_pts).astype(np.float32)
    valid = rng.random(n_pts) < 0.8
    U = np.linalg.qr(rng.standard_normal((6, 6)))[0]
    args = (jnp.asarray(p, jnp.float32), jnp.asarray(n, jnp.float32),
            jnp.asarray(w), jnp.asarray(valid), jnp.asarray(U, jnp.float32),
            0.02, 0.05)
    mean_d, var_d = drpm.compute_noise_estimate_dense(*args)
    mean_c, var_c = drpm.compute_noise_estimate(*args)
    np.testing.assert_allclose(np.asarray(mean_c), np.asarray(mean_d), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_c), np.asarray(var_d), rtol=2e-3, atol=1e-9)


def test_teaser_kcore_prunes_structured_outliers():
    """The TIM consistency k-core (TEASER's max-clique heuristic) isolates
    the mutually-consistent inlier set under 45% structured outliers that
    all point the same wrong way — the regime where plain reweighting can
    lock onto the wrong mode."""
    import jax
    from plo_tpu import geometry as geo
    from plo_tpu.solvers.gnc import solve_gnc_tls

    rng = np.random.default_rng(0)
    n = 220
    src = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    R = np.asarray(geo.exp_so3(jnp.asarray(np.array([[0.03, -0.02, 0.3]]))))[0]
    t = np.array([0.8, -0.4, 0.2], np.float32)
    ref = (src @ R.T + t + rng.normal(0, 0.005, (n, 3))).astype(np.float32)
    n_out = n * 45 // 100
    # structured outliers: coherent shift (not random) of a block
    ref[:n_out] += np.array([3.0, 1.5, -2.0], np.float32)

    delta, ok = solve_gnc_tls(
        jnp.asarray(src), jnp.asarray(ref), jnp.ones(n, bool),
        noise_bound=0.05, max_iterations=64,
        use_max_clique=True, kcore_min_fraction=0.3)
    assert bool(ok)
    got = np.asarray(delta)
    np.testing.assert_allclose(got[:3, 3], t, atol=0.02)
    np.testing.assert_allclose(got[:3, :3], R, atol=0.02)


def test_teaser_scale_estimation():
    import jax
    from plo_tpu import geometry as geo
    from plo_tpu.solvers.gnc import solve_gnc_tls

    rng = np.random.default_rng(1)
    n = 300
    src = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    scale = 1.35
    R = np.asarray(geo.exp_so3(jnp.asarray(np.array([[0.0, 0.0, 0.2]]))))[0]
    ref = (scale * src @ R.T + np.array([0.5, 0.1, -0.3])).astype(np.float32)
    delta, ok = solve_gnc_tls(
        jnp.asarray(src), jnp.asarray(ref), jnp.ones(n, bool),
        noise_bound=0.05, max_iterations=32, estimate_scaling=True,
        key=jax.random.PRNGKey(0))
    assert bool(ok)
    got = np.asarray(delta)
    # R block carries the scale (sR); residual of the full map ~ 0.
    mapped = src @ got[:3, :3].T + got[:3, 3]
    np.testing.assert_allclose(mapped, ref, atol=0.02)


def test_teaser_fgr_and_quatro_variants():
    """The FGR (graduated Geman-McClure) and QUATRO (yaw-only quasi-SO(3))
    rotation estimators (solver.h:51-62) recover a yaw+translation motion
    under 30% random outliers; QUATRO's rotation must be exactly z-only."""
    import jax
    from plo_tpu import geometry as geo
    from plo_tpu.solvers.gnc import solve_gnc_tls

    rng = np.random.default_rng(2)
    n = 400
    src = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    R = np.asarray(geo.exp_so3(jnp.asarray(np.array([[0.0, 0.0, 0.25]]))))[0]
    t = np.array([0.6, -0.3, 0.15], np.float32)
    ref = (src @ R.T + t + rng.normal(0, 0.005, (n, 3))).astype(np.float32)
    n_out = n * 30 // 100
    ref[:n_out] = rng.uniform(-12, 12, (n_out, 3)).astype(np.float32)

    for algo in ("FGR", "QUATRO"):
        delta, ok = solve_gnc_tls(
            jnp.asarray(src), jnp.asarray(ref), jnp.ones(n, bool),
            noise_bound=0.05, max_iterations=64, algorithm=algo)
        assert bool(ok), algo
        got = np.asarray(delta)
        np.testing.assert_allclose(got[:3, 3], t, atol=0.03, err_msg=algo)
        np.testing.assert_allclose(got[:3, :3], R, atol=0.03, err_msg=algo)
    # QUATRO: rotation is exactly about z (R[2,2]=1, zero x/y mixing).
    dq, _ = solve_gnc_tls(jnp.asarray(src), jnp.asarray(ref), jnp.ones(n, bool),
                          noise_bound=0.05, max_iterations=64, algorithm="QUATRO")
    gq = np.asarray(dq)
    assert abs(gq[2, 2] - 1.0) < 1e-6 and abs(gq[0, 2]) < 1e-6 and abs(gq[2, 0]) < 1e-6


def test_teaser_cost_threshold_early_stop():
    """rotation_cost_threshold terminates the GNC loop on cost convergence
    (TEASER's convergence test) without changing the solution."""
    from plo_tpu.solvers.gnc import solve_gnc_tls

    rng = np.random.default_rng(3)
    n = 200
    src = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    ref = (src + np.array([0.2, 0.1, -0.05], np.float32)
           + rng.normal(0, 0.003, (n, 3)).astype(np.float32))
    d_fix, ok1 = solve_gnc_tls(jnp.asarray(src), jnp.asarray(ref),
                               jnp.ones(n, bool), noise_bound=0.05,
                               max_iterations=64, cost_threshold=0.0)
    d_thr, ok2 = solve_gnc_tls(jnp.asarray(src), jnp.asarray(ref),
                               jnp.ones(n, bool), noise_bound=0.05,
                               max_iterations=64, cost_threshold=0.005)
    assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(np.asarray(d_fix), np.asarray(d_thr), atol=1e-3)


def test_iteration_cap_warnings():
    """Config values beyond the compile-time caps must warn, not silently
    truncate (VERDICT r3 weak 7); unknown Teaser algorithms must be rejected
    at build (solver.h:51-62)."""
    import warnings as w
    import dataclasses as dc
    from plo_tpu import config as cfgmod
    from plo_tpu.models.odometry import _build_match_solve

    def cfg_with(sv):
        return cfgmod.Config(laser_odometry=dcl(solve_method=sv))

    def dcl(solve_method):
        return dc.replace(cfgmod.LaserOdometryConfig(), solve_method=solve_method)

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        _build_match_solve(cfg_with(cfgmod.SolveConfig(
            method="ICP", icp=cfgmod.ICPSolverConfig(max_iterations=1000))))
    assert any("capped at 30" in str(r.message) for r in rec)

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        _build_match_solve(cfg_with(cfgmod.SolveConfig(
            method="Teaser", teaser=cfgmod.TeaserConfig(
                rotation_max_iterations=1000, rotation_cost_threshold=0.0))))
    assert any("capped at 64" in str(r.message) for r in rec)

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")  # threshold active: the cap never binds
        _build_match_solve(cfg_with(cfgmod.SolveConfig(
            method="Teaser", teaser=cfgmod.TeaserConfig(
                rotation_max_iterations=1000, rotation_cost_threshold=0.005))))
    assert not any("capped" in str(r.message) for r in rec)

    with pytest.raises(ValueError, match="rotation_estimation_algorithm"):
        _build_match_solve(cfg_with(cfgmod.SolveConfig(
            method="Teaser", teaser=cfgmod.TeaserConfig(
                rotation_estimation_algorithm="NOPE"))))


def test_staged_ransac_bit_identical_to_unstaged(rng):
    """The staged early-exit evaluation (solve_ransac stage=256) must be
    BIT-IDENTICAL to the single-pass form (stage=0) — the staging only
    changes which hypotheses are materialized, never the sequential-
    semantics winner (solver.cpp:316-326). Covers both regimes: stage A
    succeeding (few outliers -> min_inliers reached in the prefix) and
    stage A failing (many outliers + high min_inliers -> full sweep)."""
    for n_out, min_pct in ((50, 0.6), (260, 0.97)):
        s, d, n, valid, R, t = planar_problem(rng, n=600, n_outliers=n_out)
        key = jax.random.PRNGKey(7)
        args = (jnp.asarray(s), jnp.asarray(d), jnp.asarray(n),
                jnp.asarray(valid), key)
        kw = dict(max_iterations=800, distance_threshold=0.1,
                  min_inliers_percentage=min_pct, huber_threshold=0.648,
                  final_solve_method="LS", ls_threshold=0.02,
                  drpm_threshold=0.05, drpm_stdev_points=0.02,
                  drpm_stdev_normals=0.05)
        T_staged, ok_staged = solvers.solve_ransac(*args, stage=256, **kw)
        T_full, ok_full = solvers.solve_ransac(*args, stage=0, **kw)
        assert bool(ok_staged) == bool(ok_full)
        np.testing.assert_array_equal(np.asarray(T_staged), np.asarray(T_full))
