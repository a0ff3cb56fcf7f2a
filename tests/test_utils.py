import os

import numpy as np
import jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.cloud import PointCloud
from plo_tpu.utils import checkpoint, saver
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry


def test_saver_formats(tmp_path, rng):
    xyz = rng.random((10, 3)).astype(np.float32)
    cloud = PointCloud.from_xyz(jnp.asarray(xyz))
    import dataclasses
    cloud = dataclasses.replace(
        cloud,
        normal=jnp.asarray(np.tile([0, 0, 1.0], (10, 1)).astype(np.float32)),
        valid=jnp.asarray(np.array([True] * 8 + [False] * 2)),
    )
    p = tmp_path / "cloud.txt"
    saver.save_point_cloud_txt(cloud, str(p))
    lines = p.read_text().strip().split("\n")
    assert len(lines) == 8  # invalid rows dropped
    assert len(lines[0].split()) == 8  # x y z i nx ny nz curv

    pose = np.eye(4)
    pose[:3, 3] = [1, 2, 3]
    pp = tmp_path / "poses.txt"
    saver.save_pose_tum(pose, str(pp), "0.0")
    saver.save_pose_tum(pose, str(pp), "0.1")  # append mode
    plines = pp.read_text().strip().split("\n")
    assert len(plines) == 2
    vals = plines[0].split()
    assert len(vals) == 8
    assert float(vals[1]) == 1.0 and float(vals[3]) == 3.0
    assert abs(float(vals[7]) - 1.0) < 1e-6  # identity quat w=1

    op = tmp_path / "markers.obj"
    saver.save_normal_markers_obj(cloud, str(op))
    obj = op.read_text()
    assert obj.count("\nl ") + obj.startswith("l ") == 8

    mp = tmp_path / "matched.txt"
    saver.save_matched_points(xyz, xyz + 1, np.array([True] * 10), str(mp))
    assert len(mp.read_text().strip().split("\n")) == 10


def test_checkpoint_roundtrip(tmp_path):
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=500))),
        laser_odometry=cfgmod.LaserOdometryConfig(
            matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=5)),
        sensor=cfgmod.SensorConfig(n_scans=64),
    )
    scans, _ = synthetic.synthetic_sequence(3, n_scans=64, azimuth_steps=450, seed=1)
    odo = Odometry(cfg, capacity=32768, seed=0)
    odo.process_scan(scans[0])
    odo.process_scan(scans[1])
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(odo, path)

    odo2 = Odometry(cfg, capacity=32768, seed=0)
    checkpoint.load(odo2, path)
    assert odo2.frame_count == 2
    np.testing.assert_allclose(odo2.prev_pose, odo.prev_pose)

    # Both continue identically on the next scan.
    f_a = odo.process_scan(scans[2])
    f_b = odo2.process_scan(scans[2])
    np.testing.assert_allclose(f_a.rel_pose, f_b.rel_pose, atol=1e-6)


def test_save_scalar_append(tmp_path):
    from plo_tpu.utils import saver
    p = str(tmp_path / "thr" / "t.txt")
    saver.save_scalar_append(p, 0.123456789)
    saver.save_scalar_append(p, -2.0)
    lines = open(p).read().splitlines()
    assert lines == ["0.123457", "-2.000000"]


def test_bounding_box_masked():
    import jax.numpy as jnp
    import numpy as np
    from plo_tpu.cloud import PointCloud
    xyz = jnp.asarray(np.array([[1, 2, 3], [-5, 0, 9], [100, 100, 100]], np.float32))
    c = PointCloud.from_xyz(xyz, valid=jnp.asarray([True, True, False]))
    mn, mx = c.bounding_box()
    np.testing.assert_array_equal(np.asarray(mn), [-5, 0, 3])
    np.testing.assert_array_equal(np.asarray(mx), [1, 2, 9])


def test_odometry_sync_noop_safe():
    """sync() must be callable before any work is dispatched."""
    from plo_tpu import config as cfgmod
    from plo_tpu.models import Odometry
    odo = Odometry(cfgmod.Config(), capacity=256, async_mode=True)
    odo.sync()  # no device work, no pending results
    assert odo.finalize() == []


def test_checkpoint_roundtrip_map_mode():
    """Map-mode state (voxel map + world pose + last rel) survives a
    checkpoint/restore and the resumed engine continues the trajectory."""
    import dataclasses as dc
    from plo_tpu import config as cfgmod
    from plo_tpu.io import synthetic
    from plo_tpu.models import Odometry
    from plo_tpu.utils import checkpoint
    import tempfile, os

    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=800)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            target_mode="map",
            map=cfgmod.MapConfig(voxel_size=0.3, capacity=16384),
            matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=15),
        ),
        sensor=cfgmod.SensorConfig(n_scans=32, azimuth_resolution=0.8),
    )
    scans, _ = synthetic.synthetic_sequence(
        5, n_scans=32, azimuth_steps=450, speed=0.5, yaw_rate=0.01, seed=3)

    odo = Odometry(cfg, capacity=16384, seed=0)
    for s in scans[:3]:
        odo.process_scan(s)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        checkpoint.save(odo, path)
        odo2 = Odometry(cfg, capacity=16384, seed=0)
        checkpoint.load(odo2, path)
        assert odo2.frame_count == 3
        assert int(np.asarray(odo2._device_map.valid).sum()) == \
            int(np.asarray(odo._device_map.valid).sum())
        np.testing.assert_allclose(np.asarray(odo2._world_dev),
                                   np.asarray(odo._world_dev))
    for s in scans[3:]:
        odo.process_scan(s)
        odo2.process_scan(s)
    # Same seeds + same restored state -> same continued chain.
    np.testing.assert_allclose(odo2.poses()[-1], odo.poses()[-1], atol=1e-5)
