"""CLI end-to-end: the user-facing entry point (replaces roslaunch)."""
import json
import os
import subprocess
import sys


def light_config(tmp_path):
    """Reference-format config.json with a CPU-cheap method combo (also
    exercises the --config loading path, common.cpp:3-17)."""
    tree = {
        "scan_registration": {
            "compute_normal_method": {"format": "pointcloud", "method": "pca"},
            "presample_method": {"method": "geometric_features"},
            "sample_method": {"method": "random", "random": {"max_points": 1500}},
        },
        "laser_odometry": {
            "matching_method": {"method": "plane_ICP"},
            "solve_method": {"method": "LS", "iterations": 20},
        },
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(tree))
    return str(p)


def test_cli_synthetic_run(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "plo_tpu.cli",
         "--dataset", "synthetic", "--frames", "3", "--platform", "cpu",
         "--capacity", "16384", "--scan-lines", "32", "--azimuth-steps", "450",
         "--azimuth-resolution", "0.8", "--config", light_config(tmp_path),
         "--output", str(tmp_path), "--eval-gt", "--save-artifacts"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # Trajectory + metrics written.
    assert (tmp_path / "trajectory_tum.txt").exists()
    lines = (tmp_path / "trajectory_tum.txt").read_text().strip().split("\n")
    assert len(lines) == 3 and len(lines[0].split()) == 8
    metrics = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().strip().split("\n")]
    assert len(metrics) == 3
    assert "correspondences" in metrics[0]
    # Artifacts in reference formats.
    assert (tmp_path / "pcl_cloud" / "000000.txt").exists()
    assert (tmp_path / "pca_markers" / "000000.obj").exists()
    assert (tmp_path / "imls_results.txt").exists()
    # Per-iteration ICP artifacts (laser_odometry.cpp:621-625).
    m0 = tmp_path / "matched_points" / "f000001_i00.txt"
    assert m0.exists()
    assert len(m0.read_text().strip().split("\n")[0].split()) == 6  # sx sy sz rx ry rz
    iter_lines = (tmp_path / "iter_poses.txt").read_text().strip().split("\n")
    assert len(iter_lines) >= 2 and len(iter_lines[0].split()) == 8  # TUM rows
    # ATE JSON line on stdout.
    ate_line = [l for l in out.stdout.strip().split("\n") if l.startswith("{")][-1]
    assert "ate_m" in json.loads(ate_line)


def test_cli_kitti_layout(tmp_path):
    """End-to-end over the on-disk KITTI odometry layout: synthetic scans
    written as velodyne .bin files, cam0-frame GT poses + calib Tr (the
    reader must conjugate GT back into the velodyne frame)."""
    import numpy as np
    from plo_tpu.io import synthetic

    scans, gt_velo = synthetic.synthetic_sequence(
        3, n_scans=32, azimuth_steps=450, speed=0.5, yaw_rate=0.005, seed=4)

    root = tmp_path / "kitti"
    vdir = root / "sequences" / "07" / "velodyne"
    vdir.mkdir(parents=True)
    (root / "poses").mkdir()
    for i, s in enumerate(scans):
        np.asarray(s, np.float32).tofile(vdir / f"{i:06d}.bin")
    # A nontrivial velodyne->cam0 extrinsic (axis permutation + offset, like
    # the real KITTI Tr).
    tr = np.eye(4)
    tr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    tr[:3, 3] = [0.05, -0.07, -0.27]
    gt_cam = np.einsum("ij,njk,kl->nil", tr, gt_velo, np.linalg.inv(tr))
    with open(root / "poses" / "07.txt", "w") as f:
        for p in gt_cam:
            f.write(" ".join(f"{v:.9f}" for v in p[:3].reshape(-1)) + "\n")
    with open(root / "sequences" / "07" / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(f"{v:.9f}" for v in tr[:3].reshape(-1)) + "\n")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "plo_tpu.cli",
         "--dataset", "kitti", "--kitti-root", str(root), "--seq", "07",
         "--frames", "3", "--platform", "cpu", "--capacity", "16384",
         "--scan-lines", "32", "--azimuth-resolution", "0.8",
         "--config", light_config(tmp_path),
         "--output", str(tmp_path / "out"), "--eval-gt"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ate_line = [l for l in out.stdout.strip().split("\n") if l.startswith("{")][-1]
    ate = json.loads(ate_line)["ate_m"]
    assert ate < 0.1, f"KITTI-layout ATE too high: {ate}"
