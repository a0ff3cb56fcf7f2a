"""KITTI-density drill (VERDICT r3 item 6): the real `--dataset kitti` CLI
path at HDL-64 density and full capacity.

No KITTI data ships in this environment; a ~120k-pts/scan synthetic sequence
is written in the exact KITTI odometry layout (velodyne .bin, cam0-frame
poses, calib.txt with a non-trivial Tr) and the production CLI reads it back
through the native prefetcher, runs the full pipeline at capacity 131072, and
evaluates ATE against the conjugated ground truth. Asserted: ~KITTI point
density, ZERO truncation, the calib round trip (ATE only lines up if
poses_to_velodyne_frame inverted the written conjugation), and a finite,
recorded wall clock."""
import json
import os
import time
import warnings

import numpy as np
import pytest

pytestmark = pytest.mark.slow

FRAMES = 4
CAPACITY = 131072


def test_kitti_density_cli_drill(tmp_path, capsys):
    from plo_tpu.io import synthetic
    from plo_tpu import cli

    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=150.0)
    scans, gt_velo = synthetic.synthetic_sequence(
        FRAMES, n_scans=64, azimuth_steps=1900, speed=1.0, yaw_rate=0.005,
        seed=3, world=world)
    counts = np.array([len(s) for s in scans])
    assert (counts > 110_000).all(), counts   # KITTI-class density
    assert (counts <= CAPACITY).all(), counts
    synthetic.write_kitti_layout(str(tmp_path), scans, gt_velo)

    # CPU-tractable green-method config at full density: pca normals ->
    # geometric features -> random sample -> plane_ICP -> LS.
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "scan_registration": {
            "compute_normal_method": {"format": "pointcloud", "method": "pca"},
            "presample_method": {"method": "geometric_features"},
            "sample_method": {"method": "random", "random": {"max_points": 2000}},
        },
        "laser_odometry": {
            "matching_method": {"method": "plane_ICP"},
            "solve_method": {"method": "LS", "iterations": 30},
            "motion_prior": True,
        },
    }))
    out = tmp_path / "out"
    t0 = time.perf_counter()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        rc = cli.main([
            "--config", str(cfg_path), "--dataset", "kitti",
            "--kitti-root", str(tmp_path), "--seq", "00",
            "--capacity", str(CAPACITY), "--frames", str(FRAMES),
            "--azimuth-resolution", str(360.0 / 1900),
            "--output", str(out), "--eval-gt",
        ])
    wall = time.perf_counter() - t0
    assert rc == 0
    # Zero truncation at KITTI density.
    assert not any("exceeds capacity" in str(r.message) for r in rec)

    stdout = capsys.readouterr().out
    metrics = [json.loads(line) for line in stdout.splitlines()
               if line.startswith("{")]
    assert metrics, stdout[-2000:]
    ate = metrics[-1]["ate_m"]
    # The calib conjugation round trip: ATE against cam0-written GT read back
    # through Tr^-1 T Tr must evaluate in the velodyne frame.
    assert np.isfinite(ate) and ate < 0.25, (ate, stdout[-2000:])
    assert (out / "trajectory_tum.txt").exists()
    print(f"\nKITTI-density drill: {FRAMES} frames x ~{counts.mean():.0f} pts, "
          f"wall {wall:.1f} s ({FRAMES / wall:.2f} scans/s on CPU), ate {ate * 1000:.1f} mm")
