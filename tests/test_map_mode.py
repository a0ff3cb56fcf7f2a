"""Frame-to-map odometry (target_mode="map"): the persistent voxel-map target
that generalizes accumulateTargetCloud (laser_odometry.cpp:116-136), plus the
grid-hash correspondence engine wired into the production path."""
import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.cloud import PointCloud
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.ops import voxel
from plo_tpu.utils import evaluate

N_SCANS, AZ_STEPS, CAPACITY = 32, 450, 16384


def mkcfg(target_mode="map", search="dense", match="plane_ICP", voxel_size=0.3):
    return cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1200)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            target_mode=target_mode,
            map=cfgmod.MapConfig(voxel_size=voxel_size, capacity=32768, search=search),
            matching_method=cfgmod.MatchingConfig(method=match),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
            refresh_correspondences=(match != "IMLS"),
        ),
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS),
    )


def test_voxel_map_insert_semantics():
    rng = np.random.default_rng(0)
    cap = 64
    m = PointCloud.zeros(cap)
    center = jnp.zeros(3)

    # First insertion: one point per voxel, first arrival wins.
    xyz = np.array([[0.1, 0.1, 0.1], [0.15, 0.12, 0.11],   # same 0.3-voxel
                    [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    new = PointCloud.from_xyz(jnp.asarray(xyz))
    m1 = voxel.voxel_map_insert(m, new, 0.3, center)
    v1 = np.asarray(m1.valid)
    assert v1.sum() == 3
    got = {tuple(round(float(x), 3) for x in p) for p in np.asarray(m1.xyz)[v1]}
    assert (0.1, 0.1, 0.1) in got          # first arrival, not the second
    assert (0.15, 0.12, 0.11) not in got

    # Second insertion: occupied voxels are stable (points never move).
    xyz2 = np.array([[0.12, 0.13, 0.14],   # occupied voxel -> dropped
                     [2.0, 2.0, 0.0]], np.float32)
    m2 = voxel.voxel_map_insert(m1, PointCloud.from_xyz(jnp.asarray(xyz2)), 0.3, center)
    v2 = np.asarray(m2.valid)
    assert v2.sum() == 4
    got2 = {tuple(round(float(x), 3) for x in p) for p in np.asarray(m2.xyz)[v2]}
    assert (0.1, 0.1, 0.1) in got2 and (2.0, 2.0, 0.0) in got2
    assert (0.12, 0.13, 0.14) not in got2

    # Capacity eviction: farthest from center go first.
    m_small = PointCloud.zeros(8)
    far = rng.uniform(50, 60, (6, 3)).astype(np.float32)
    near = rng.uniform(-1, 1, (6, 3)).astype(np.float32)
    both = PointCloud.from_xyz(jnp.asarray(np.concatenate([far, near])))
    m3 = voxel.voxel_map_insert(m_small, both, 0.3, center)
    kept = np.asarray(m3.xyz)[np.asarray(m3.valid)]
    assert (np.linalg.norm(kept, axis=1) < 10).sum() == 6  # all near pts kept


def test_map_mode_beats_window_on_long_run():
    """VERDICT r1 done-criterion: frame-to-map ATE <= frame-to-frame ATE on a
    >=30-frame run (the map anchors the pose chain; the window random-walks)."""
    scans, gt = synthetic.synthetic_sequence(
        30, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.5, yaw_rate=0.02, seed=3)
    gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    ate = {}
    for mode in ("window", "map"):
        odo = Odometry(mkcfg(mode), capacity=CAPACITY, seed=0, async_mode=True)
        odo.process_scans(scans, batch=5)
        odo.finalize()
        ate[mode] = evaluate.ate_rmse(odo.poses(), gtr, align=False)
    assert ate["map"] <= ate["window"], ate
    assert ate["map"] < 0.02, ate


def test_map_grid_hash_matches_dense():
    """grid_hash search against the voxel map reproduces the dense engine's
    trajectory (the 20 nearest neighbors on a 0.3 m voxel map live inside the
    1.5 m grid cell, so the candidate sets coincide)."""
    scans, gt = synthetic.synthetic_sequence(
        6, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.5, yaw_rate=0.01, seed=3)
    poses = {}
    for search in ("dense", "grid_hash"):
        odo = Odometry(mkcfg("map", search=search, match="IMLS"),
                       capacity=CAPACITY, seed=0)
        for s in scans:
            odo.process_scan(s)
        poses[search] = odo.poses()
    dt = np.linalg.norm(poses["grid_hash"][:, :3, 3] - poses["dense"][:, :3, 3], axis=1)
    assert dt.max() < 2e-3, dt


def test_map_batched_matches_single():
    """The lax.scan map-mode frame loop reproduces the per-frame path's
    quality class (keys differ between the paths, so comparison is by ATE —
    measured 45 vs 56 mm on this short sparse-map sequence; a young map is
    sparser than a full previous frame, so the window beats both here and
    test_map_mode_beats_window_on_long_run covers the long-run flip)."""
    scans, gt = synthetic.synthetic_sequence(
        7, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.5, yaw_rate=0.01, seed=3)
    gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    odo_b = Odometry(mkcfg("map"), capacity=CAPACITY, seed=0, async_mode=True)
    odo_b.process_scans(scans, batch=3)
    odo_b.finalize()
    assert odo_b.frame_count == 7
    ate_b = evaluate.ate_rmse(odo_b.poses(), gtr, align=False)

    odo_s = Odometry(mkcfg("map"), capacity=CAPACITY, seed=0)
    for s in scans:
        odo_s.process_scan(s)
    ate_s = evaluate.ate_rmse(odo_s.poses(), gtr, align=False)
    assert ate_b < 0.1 and ate_s < 0.1, (ate_b, ate_s)
    assert ate_b < 2.5 * ate_s + 0.01, (ate_b, ate_s)


def test_world_pose_stays_orthonormal():
    """The map-mode pose chain re-projects onto SO(3) every frame; without it,
    the transpose-inverse in rel = world^-1 @ wpose doubles the orthonormality
    defect per frame (measured det(R)=0.989 by frame 15 pre-fix)."""
    scans, _ = synthetic.synthetic_sequence(
        10, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.5, yaw_rate=0.02, seed=3)
    odo = Odometry(mkcfg("map"), capacity=CAPACITY, seed=0)
    for s in scans:
        odo.process_scan(s)
    R = np.asarray(odo._world_dev, np.float64)[:3, :3]
    assert abs(np.linalg.det(R) - 1.0) < 1e-5
    sv = np.linalg.svd(R, compute_uv=False)
    assert np.abs(sv - 1.0).max() < 1e-5
