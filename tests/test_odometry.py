"""End-to-end odometry integration tests on synthetic sequences
(the golden-trajectory tests the reference never had — SURVEY.md §4)."""
import numpy as np
import pytest

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.utils import evaluate


def rel_to_first(poses):
    return np.einsum("ij,njk->nik", np.linalg.inv(poses[0]), poses)


# CPU-sized test scans: 32 beams x 450 firings (~11k valid points) keep every
# code path identical to the HDL-64 x 900 production shape while running the
# whole e2e file in ~2 min on CPU; one full-size run is kept under -m slow.
N_SCANS, AZ_STEPS, CAPACITY = 32, 450, 16384


def small_sequence(n_frames, speed=0.5, yaw_rate=0.01, seed=3, world=None):
    return synthetic.synthetic_sequence(
        n_frames, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=speed,
        yaw_rate=yaw_rate, seed=seed, world=world)


def run_sequence(cfg, n_frames=5, speed=0.5, yaw_rate=0.01, seed=3, world=None):
    scans, gt = small_sequence(n_frames, speed=speed, yaw_rate=yaw_rate,
                               seed=seed, world=world)
    odo = Odometry(cfg, capacity=CAPACITY, seed=0)
    for s in scans:
        odo.process_scan(s)
    est = odo.poses()
    return est, rel_to_first(gt), odo


def base_config(**kw):
    return cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(format="pointcloud", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1500)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(**kw),
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS),
    )


def test_minimal_slice_plane_icp_ls():
    """The SURVEY §7.2 minimum slice: pca -> geofeatures -> random ->
    plane_ICP -> trimmed LS."""
    cfg = base_config(
        matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
        solve_method=cfgmod.SolveConfig(method="LS", iterations=30),
    )
    est, gt, odo = run_sequence(cfg)
    ate = evaluate.ate_rmse(est, gt, align=False)
    assert ate < 0.1, f"ATE {ate}"
    # Convergence within the iteration budget.
    # Frames with a motion-prior history must converge inside the budget;
    # frame 1 (identity-init bootstrap at 0.5 m displacement) may legally
    # consume all 30 iterations — trimmed LS can limit-cycle at the mm scale
    # there, and running out the budget is normal REFERENCE behavior (the
    # break conditions laser_odometry.cpp:571-576 fire only on convergence
    # or failure; the cap exists for exactly this). Accuracy is pinned by
    # the ATE assert above.
    assert all(f.iterations < 30 for f in odo.trajectory[2:])


def test_imls_ls():
    cfg = base_config(
        matching_method=cfgmod.MatchingConfig(method="IMLS"),
        solve_method=cfgmod.SolveConfig(method="LS", iterations=30),
    )
    est, gt, _ = run_sequence(cfg, n_frames=4)
    ate = evaluate.ate_rmse(est, gt, align=False)
    assert ate < 0.1, f"ATE {ate}"


def test_imls_ransac_drpm():
    """The BASELINE.json headline config: IMLS matching + RANSAC/DRPM solve.

    Run on a structure-rich world: in a ground-plane-dominated scene DRPM
    (faithfully to the reference math — verified against a float64 oracle)
    flags the lateral directions as sub-noise and conservatively zeroes them,
    so the ICP loop freezes; with enough wall structure all six directions are
    observable and the full pipeline converges to mm-level ATE."""
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    cfg = base_config(
        matching_method=cfgmod.MatchingConfig(method="IMLS"),
        solve_method=cfgmod.SolveConfig(
            method="RANSAC", iterations=30,
            ransac=cfgmod.RANSACConfig(max_iterations=300, distance_threshold=0.2,
                                       final_solve_method="DRPM")),
    )
    est, gt, _ = run_sequence(cfg, n_frames=4, world=world)
    ate = evaluate.ate_rmse(est, gt, align=False)
    assert ate < 0.05, f"ATE {ate}"


def test_rotation_recovered():
    cfg = base_config(
        matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
        solve_method=cfgmod.SolveConfig(method="LS", iterations=30),
    )
    est, gt, _ = run_sequence(cfg, n_frames=5, speed=0.3, yaw_rate=0.03)
    terr, rerr = evaluate.rpe(est, gt)
    assert terr < 0.05
    assert rerr < 0.01


def test_ate_utils():
    n = 10
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n)
    noisy = poses.copy()
    noisy[:, 1, 3] += 0.1
    assert evaluate.ate_rmse(noisy, poses, align=False) == pytest.approx(0.1, abs=1e-6)
    assert evaluate.ate_rmse(noisy, poses, align=True) < 0.01


def test_batched_driver_matches_single_frame_quality():
    """The on-device lax.scan frame loop must reproduce the sequential
    semantics: same-quality trajectory as the per-frame path (keys differ, so
    comparison is by ATE, not bitwise)."""
    cfg = base_config(
        matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
        solve_method=cfgmod.SolveConfig(method="LS", iterations=30),
    )
    scans, gt = small_sequence(6)
    gtr = rel_to_first(gt)

    odo = Odometry(cfg, capacity=CAPACITY, seed=0, async_mode=True)
    odo.process_scans(scans, batch=4)
    odo.finalize()
    assert odo.frame_count == 6
    ate = evaluate.ate_rmse(odo.poses(), gtr, align=False)
    assert ate < 0.1, f"batched ATE {ate}"


def test_undistort_cloud_inverts_motion_distortion(rng=np.random.default_rng(0)):
    """Distort a static cloud by per-point fractional motion (what a moving
    sensor would record), then verify undistort_cloud recovers the original
    geometry given the relative pose."""
    import dataclasses as dc
    import jax.numpy as jnp
    from plo_tpu import geometry as geo
    from plo_tpu.cloud import PointCloud
    from plo_tpu.ops.undistort import undistort_cloud

    n = 500
    xyz = ((rng.random((n, 3)) - 0.5) * 40).astype(np.float32)
    rel_time = rng.random(n).astype(np.float32)
    rel = np.asarray(geo.make_se3(
        jnp.asarray(np.asarray(geo.exp_so3(jnp.asarray(np.array([[0, 0, 0.02]]))))[0]),
        jnp.asarray(np.array([0.5, 0.02, 0.0]))))
    # Sensor moved by `rel` over the sweep: a point fired at time t appears at
    # interp(rel, t)^-1 applied... distort with the inverse fractional pose.
    T_frac = np.asarray(geo.interpolate_pose(jnp.asarray(rel), jnp.asarray(rel_time)))
    distorted = np.einsum("pij,pj->pi", np.linalg.inv(T_frac)[:, :3, :3], xyz) \
        + np.linalg.inv(T_frac)[:, :3, 3]

    cloud = PointCloud.from_xyz(jnp.asarray(distorted.astype(np.float32)))
    cloud = dc.replace(cloud, intensity=jnp.asarray(0.1 * rel_time))
    restored = undistort_cloud(cloud, jnp.asarray(rel.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(restored.xyz), xyz, atol=1e-3)


def test_undistortion_improves_ate_on_swept_scans():
    """On sequences with real per-point sweep-motion distortion
    (synthetic.distort_sequence), constant-velocity undistortion must improve
    ATE — and it must compensate BOTH the source and the model cloud: an
    undistorted source matched against a distorted target measured 526 mm vs
    48 mm uncompensated (consecutive equal distortions largely cancel);
    with both compensated: 16 mm."""
    import dataclasses as dc
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    scans, gt = small_sequence(8, speed=0.8, yaw_rate=0.02, world=world)
    scans = synthetic.distort_sequence(scans, gt, N_SCANS)
    gtr = rel_to_first(gt)
    ate = {}
    for undistort in (False, True):
        cfg = base_config(
            motion_prior=True, undistort=undistort,
            matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=25),
        )
        odo = Odometry(cfg, capacity=CAPACITY, seed=0)
        for s in scans:
            odo.process_scan(s)
        ate[undistort] = evaluate.ate_rmse(odo.poses(), gtr, align=False)
    assert ate[True] < ate[False], ate
    assert ate[True] < 0.03, ate
    # The batched lax.scan driver compensates the model cloud too.
    odo_b = Odometry(cfg, capacity=CAPACITY, seed=0, async_mode=True)
    odo_b.process_scans(scans, batch=3)
    odo_b.finalize()
    ate_b = evaluate.ate_rmse(odo_b.poses(), gtr, align=False)
    assert ate_b < 0.04, ate_b


def test_interpolate_pose_endpoints(rng):
    import jax.numpy as jnp
    from plo_tpu import geometry as geo
    w = rng.normal(size=3) * 0.2
    R = np.asarray(geo.exp_so3(jnp.asarray(w[None])))[0]
    T = np.asarray(geo.make_se3(jnp.asarray(R), jnp.asarray(np.array([1.0, -2.0, 0.5]))))
    T0 = np.asarray(geo.interpolate_pose(jnp.asarray(T), jnp.asarray(np.array([0.0]))))[0]
    T1 = np.asarray(geo.interpolate_pose(jnp.asarray(T), jnp.asarray(np.array([1.0]))))[0]
    np.testing.assert_allclose(T0, np.eye(4), atol=1e-5)
    np.testing.assert_allclose(T1, T, atol=1e-4)


def test_motion_prior_mode():
    """Constant-velocity ICP initialization: equal-or-better trajectory on a
    fast sequence (1 m/frame)."""
    import dataclasses as dc
    cfg = base_config(
        matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
        solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
    )
    cfg = dc.replace(cfg, laser_odometry=dc.replace(cfg.laser_odometry, motion_prior=True))
    est, gt, odo = run_sequence(cfg, n_frames=5, speed=1.0)
    ate = evaluate.ate_rmse(est, gt, align=False)
    assert ate < 0.1, f"ATE {ate}"
    # Batched driver honors the prior too.
    scans, gt2 = small_sequence(6, speed=1.0)
    odo2 = Odometry(cfg, capacity=CAPACITY, seed=0, async_mode=True)
    odo2.process_scans(scans, batch=4)
    odo2.finalize()
    gtr2 = rel_to_first(gt2)
    assert evaluate.ate_rmse(odo2.poses(), gtr2, align=False) < 0.1


def test_batched_driver_multi_queue():
    """max_queue_size=2: the batched driver's rolling window must match the
    per-frame path's accumulated 2-frame target (identical ATE class)."""
    import dataclasses as dc
    cfg = base_config(
        matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
        solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
    )
    cfg = dc.replace(cfg, laser_odometry=dc.replace(cfg.laser_odometry, max_queue_size=2))
    scans, gt = small_sequence(6)
    gtr = rel_to_first(gt)
    odo = Odometry(cfg, capacity=CAPACITY, seed=0, async_mode=True)
    odo.process_scans(scans, batch=4)
    odo.finalize()
    ate = evaluate.ate_rmse(odo.poses(), gtr, align=False)
    assert ate < 0.1, f"ATE {ate}"


def test_grid_pca_frontend_e2e():
    """TPU-fast frontend (format=range_image, method=pca: grid-stencil PCA)
    drives the full IMLS+RANSAC/DRPM pipeline to the same mm-level ATE as the
    compact-layout parity path."""
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(
                format="range_image", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1500)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=30),
        ),
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS),
    )
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
    est, gt, _ = run_sequence(cfg, n_frames=4, world=world)
    ate = evaluate.ate_rmse(est, gt, align=False)
    assert ate < 0.05, f"ATE {ate}"


def test_quantized_transfer_trajectory():
    """int16 fixed-point scan transfer (5 mm steps) must not disturb the
    trajectory beyond the sensor-noise floor vs float32 transfer."""
    cfg = base_config(
        matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
        solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
    )
    scans, gt = small_sequence(6, speed=0.4)
    poses = {}
    for transfer in ("float32", "int16"):
        odo = Odometry(cfg, capacity=CAPACITY, seed=0, async_mode=True, transfer=transfer)
        odo.process_scans(scans, batch=2)
        odo.finalize()
        poses[transfer] = odo.poses()
    gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    for transfer, p in poses.items():
        ate = evaluate.ate_rmse(p, gtr, align=False)
        assert ate < 0.05, f"{transfer} ATE {ate}"
    # the two transfer modes agree to sub-cm
    dt = np.linalg.norm(poses["int16"][:, :3, 3] - poses["float32"][:, :3, 3], axis=1)
    assert dt.max() < 0.02, dt


@pytest.mark.slow
def test_full_size_hdl64_headline():
    """Full-size HDL-64 x 900 run of the headline config (IMLS + RANSAC/DRPM)
    — the production shape; excluded from the default suite (-m slow)."""
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(format="pointcloud", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(
                method="RANSAC", iterations=30,
                ransac=cfgmod.RANSACConfig(max_iterations=300, distance_threshold=0.2,
                                           final_solve_method="DRPM")),
        ),
        sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4),
    )
    scans, gt = synthetic.synthetic_sequence(
        4, n_scans=64, azimuth_steps=900, speed=0.5, yaw_rate=0.01, seed=3, world=world)
    odo = Odometry(cfg, capacity=65536, seed=0)
    for s in scans:
        odo.process_scan(s)
    ate = evaluate.ate_rmse(odo.poses(), rel_to_first(gt), align=False)
    assert ate < 0.05, f"ATE {ate}"


def test_grid16_transfer_trajectory():
    """grid16 transfer (the [H, W] uint16 range raster, 2 B/cell vs 6 B/point
    int16: ~3x less H2D and no on-device preprocess/rasterize) must match the
    int16 trajectory to the quantizer floor on raster-aligned scans."""
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(
                format="range_image", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1500)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            refresh_correspondences=False,
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
        ),
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS),
    )
    scans, gt = small_sequence(6)
    gtr = rel_to_first(gt)
    poses = {}
    for transfer in ("int16", "grid16"):
        odo = Odometry(cfg, capacity=CAPACITY, seed=0, async_mode=True, transfer=transfer)
        odo.process_scans(scans, batch=3)
        odo.finalize()
        poses[transfer] = odo.poses()
        assert evaluate.ate_rmse(poses[transfer], gtr, align=False) < 0.05
    d = np.linalg.norm(poses["grid16"][:, :3, 3] - poses["int16"][:, :3, 3], axis=1)
    assert d.max() < 0.02, d
    # Native and NumPy rasterizers agree bit-for-bit.
    from plo_tpu import native
    from plo_tpu.models.pipeline import GRID16_SCALE
    g1 = np.zeros((N_SCANS, AZ_STEPS), np.uint16)
    g2 = np.zeros((N_SCANS, AZ_STEPS), np.uint16)
    raw = np.ascontiguousarray(scans[0][:, :4], np.float32)
    n1 = native.rasterize_grid16(raw, N_SCANS, AZ_STEPS, 1 / GRID16_SCALE, 2.0, 150.0, g1)
    n2 = native.rasterize_grid16_numpy(raw, N_SCANS, AZ_STEPS, 1 / GRID16_SCALE, 2.0, 150.0, g2)
    if n1 is not None:  # native toolchain available
        assert n1 == n2 and (g1 == g2).all()


def test_grid16_beam_perturbation_honesty():
    """grid16 under KITTI-like beam-elevation error (VERDICT r3 task 2): real
    HDL-64 beams fire up to ~0.15 deg off the nominal ring elevations, and the
    grid16 transport snaps every return onto the nominal ray (a transverse
    displacement of r*tan(d_elev) ~ 8 cm at 30 m), while int16 ships the true
    xyz. Both transports run the same perturbed-beam sequence; the test pins
    the honest claim recorded in BASELINE.md: the grid16 trajectory stays
    convergent (the per-ring bias is static, so frame-to-frame registration
    of identically-displaced geometry mostly cancels it), and the measured
    grid16-vs-int16 ATE delta is recorded so the headline split (int16 =
    real-sensor number, grid16 = raster-aligned number) stays justified."""
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(
                format="range_image", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1500)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            refresh_correspondences=False,
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
        ),
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS),
    )
    rng = np.random.default_rng(5)
    offsets = rng.uniform(-0.15, 0.15, size=N_SCANS)
    scans, gt = synthetic.synthetic_sequence(
        6, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.5, yaw_rate=0.01,
        seed=3, elev_offsets_deg=offsets)
    gtr = rel_to_first(gt)
    ate = {}
    for transfer in ("int16", "grid16"):
        odo = Odometry(cfg, capacity=CAPACITY, seed=0, async_mode=True,
                       transfer=transfer)
        odo.process_scans(scans, batch=3)
        odo.finalize()
        ate[transfer] = evaluate.ate_rmse(odo.poses(), gtr, align=False)
    # Both transports must remain convergent under perturbed beams...
    assert ate["int16"] < 0.05, ate
    assert ate["grid16"] < 0.05, ate
    # ...and the grid16 penalty must stay within the range-noise class
    # (2 cm over this 3 m run). If this breaks, grid16 must be demoted to a
    # synthetic-only transport in bench.py/BASELINE.md.
    assert ate["grid16"] - ate["int16"] < 0.02, ate


def test_grid16_requires_range_image():
    cfg = base_config()
    with pytest.raises(ValueError, match="grid16"):
        Odometry(cfg, capacity=CAPACITY, transfer="grid16")


@pytest.mark.slow
def test_faithful_reference_config_regression():
    """The faithful-config regression (VERDICT r3 task 1): the reference's
    shipped config.json loaded 1:1 — pointcloud/pca kdtree normals,
    major_axis/FPS sampling, IMLS with PER-ITERATION full re-search
    (laser_odometry.cpp:524-647), RANSAC-5000/DRPM, identity ICP init — must
    stay convergent end-to-end, and the frozen-correspondence optimization
    (bench.py's documented extension) must match its trajectory. This is the
    accuracy side of the scans_per_sec_faithful_* rows in BASELINE.md: perf
    work on the faithful path (Pallas cylinder kernel, counting-sort
    preprocess, single-chunk RANSAC scoring) is pinned here against the
    re-search semantics."""
    import dataclasses
    cfg = cfgmod.load(
        "/root/reference/config.json",
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS))
    assert cfg.laser_odometry.refresh_correspondences  # reference semantics
    assert not cfg.laser_odometry.motion_prior         # identity ICP init
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    scans, gt = small_sequence(6, world=world)
    gtr = rel_to_first(gt)

    odo = Odometry(cfg, capacity=CAPACITY, seed=0)
    for s in scans:
        odo.process_scan(s)
    ate_refresh = evaluate.ate_rmse(odo.poses(), gtr, align=False)
    # 32-beam test sparsity puts the IMLS blend bias at the few-cm level
    # (BASELINE.md method-matrix note); catastrophic divergence is what this
    # guards against.
    assert ate_refresh < 0.15, ate_refresh

    frozen = dataclasses.replace(
        cfg, laser_odometry=dataclasses.replace(
            cfg.laser_odometry, refresh_correspondences=False))
    odo2 = Odometry(frozen, capacity=CAPACITY, seed=0)
    for s in scans:
        odo2.process_scan(s)
    ate_frozen = evaluate.ate_rmse(odo2.poses(), gtr, align=False)
    assert abs(ate_frozen - ate_refresh) < 0.05, (ate_refresh, ate_frozen)


@pytest.mark.slow
def test_method_matrix_all_green_combos_converge():
    """The results.png analog (VERDICT r1 item 9): every green reference
    method combination converges on the hardened synthetic (2 cm noise,
    sweep distortion, 1% outliers). Full table: tools/method_matrix.py /
    BASELINE.md."""
    import subprocess
    import sys
    import os
    out = subprocess.run(
        [sys.executable, "tools/method_matrix.py", "--frames", "6",
         "--threshold", "0.1"],
        capture_output=True, text=True, timeout=3500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0, out.stdout[-3000:]
    assert "36/36 combos converged" in out.stdout


def test_normal_sampler_e2e():
    """sample_method='normal' (spherical-histogram binning — gray/unverified
    in the reference's own matrix) drives the full pipeline to a sane
    trajectory."""
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="normal",
                normal=cfgmod.NormalSampleConfig(max_points_per_bin=40)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
        ),
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS),
    )
    est, gt, odo = run_sequence(cfg, n_frames=4)
    ate = evaluate.ate_rmse(est, gt, align=False)
    assert ate < 0.1, ate
    assert odo.trajectory[-1].n_correspondences > 50


def test_grid16_16_beam_e2e_and_beam_model_consistency():
    """grid16 on a 16-beam sensor end-to-end (the 32-beam case is
    test_grid16_transfer_trajectory), plus the packing/reconstruction beam
    model unification (VERDICT r3 weak 6): for every supported beam count the
    rasterizer's row binning and the pipeline's xyz reconstruction must
    invert the SAME ring_elevation_table — a point fired exactly along
    table[r] at range R must land in row r and reconstruct to elevation
    table[r] within the 5 mm range quantizer."""
    from plo_tpu import native
    from plo_tpu.models.pipeline import GRID16_SCALE
    from plo_tpu.ops.preprocess import ring_elevation_table

    # Beam-model consistency across 16/32/64.
    for n_scans in (16, 32, 64):
        tbl = ring_elevation_table(n_scans)
        live = {16: 16, 32: 27, 64: 51}[n_scans]  # rows ring assignment emits
        # 1e-3 deg inward nudge: beam 0 of the HDL-64 model sits exactly on
        # the angle<=2.0 gate and f32 atan2 round-trip can tip it outside.
        el = np.deg2rad(tbl[:live].astype(np.float64) - 1e-3)
        r3d = 20.0
        pts = np.stack([r3d * np.cos(el), np.zeros_like(el),
                        r3d * np.sin(el)], axis=1).astype(np.float32)
        pts = np.concatenate([pts, np.full((live, 1), 0.5, np.float32)], axis=1)
        g = np.zeros((n_scans, 64), np.uint16)
        native.rasterize_grid16_numpy(pts, n_scans, 64, 1 / GRID16_SCALE,
                                      2.0, 150.0, g)
        rows = np.nonzero(g.any(axis=1))[0]
        assert set(rows) == set(range(live)), (n_scans, rows)
        assert not g[live:].any()  # dead rows stay empty
        # Reconstruction: range * sin(table[row]) must give back each z.
        for r in rows:
            rec_z = g[r, 0] * GRID16_SCALE * np.sin(np.deg2rad(tbl[r]))
            assert abs(rec_z - r3d * np.sin(np.deg2rad(tbl[r]))) < 0.01

    # 16-beam end-to-end: grid16 trajectory matches int16.
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(
                format="range_image", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1200)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            refresh_correspondences=False,
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
        ),
        sensor=cfgmod.SensorConfig(n_scans=16, azimuth_resolution=360.0 / AZ_STEPS),
    )
    scans, gt = synthetic.synthetic_sequence(
        5, n_scans=16, azimuth_steps=AZ_STEPS, speed=0.4, yaw_rate=0.01, seed=3)
    gtr = rel_to_first(gt)
    poses = {}
    for transfer in ("int16", "grid16"):
        odo = Odometry(cfg, capacity=8192, seed=0, transfer=transfer)
        for s in scans:
            odo.process_scan(s)
        poses[transfer] = odo.poses()
        assert evaluate.ate_rmse(poses[transfer], gtr, align=False) < 0.06
    d = np.linalg.norm(poses["grid16"][:, :3, 3] - poses["int16"][:, :3, 3], axis=1)
    assert d.max() < 0.03, d


@pytest.mark.slow
def test_hybrid_refresh_matches_full_research():
    """Hybrid-refresh parity (the refresh_motion_threshold extension): under
    the faithful reference config (per-iteration full re-search semantics,
    laser_odometry.cpp:524-647), re-searching only while the accumulated
    per-point motion exceeds the default 2 cm bound must reproduce the
    unconditional-re-search trajectory to well inside the config's own
    1 mm convergence tolerance per frame."""
    import dataclasses
    cfg = cfgmod.load(
        "/root/reference/config.json",
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS))
    assert cfg.laser_odometry.refresh_motion_threshold > 0  # hybrid default ON
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    scans, gt = small_sequence(6, world=world)
    gtr = rel_to_first(gt)

    pure = dataclasses.replace(
        cfg, laser_odometry=dataclasses.replace(
            cfg.laser_odometry, refresh_motion_threshold=0.0))
    poses = {}
    for name, c in (("hybrid", cfg), ("pure", pure)):
        odo = Odometry(c, capacity=CAPACITY, seed=0)
        for s in scans:
            odo.process_scan(s)
        poses[name] = odo.poses()
    d = np.linalg.norm(poses["hybrid"][:, :3, 3] - poses["pure"][:, :3, 3], axis=1)
    assert d.max() < 0.01, f"hybrid refresh diverged from full re-search: {d}"
    ate = evaluate.ate_rmse(poses["hybrid"], gtr, align=False)
    assert ate < 0.15, ate
