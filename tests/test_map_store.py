import numpy as np
import jax.numpy as jnp

from plo_tpu.cloud import PointCloud
from plo_tpu.parallel import get_mesh
from plo_tpu.parallel.map_store import ShardedMapStore, partition_cloud, voxel_shard_id


def test_partition_preserves_points(rng):
    n = 4096
    xyz = (rng.random((n, 3)) - 0.5).astype(np.float32) * 100
    valid = rng.random(n) > 0.1
    cloud = PointCloud.from_xyz(jnp.asarray(xyz), jnp.asarray(valid))
    part, counts = partition_cloud(cloud, 8, 1024)
    assert int(counts.sum()) == valid.sum()  # nothing dropped (no overflow)
    # Every valid partitioned point exists in the source set.
    pv = np.asarray(part.valid)
    pxyz = np.asarray(part.xyz)[pv]
    src = set(map(tuple, xyz[valid].round(4)))
    assert all(tuple(p.round(4)) in src for p in pxyz[:50])
    # Shard-major layout: points in shard d occupy [d*M, (d+1)*M).
    shard_of = np.asarray(voxel_shard_id(jnp.asarray(pxyz), 8))
    rows = np.nonzero(pv)[0]
    np.testing.assert_array_equal(rows // 1024, shard_of)


def test_sharded_knn_exact(rng):
    mesh = get_mesh(8)
    n = 4096
    xyz = (rng.random((n, 3)) - 0.5).astype(np.float32) * 100
    cloud = PointCloud.from_xyz(jnp.asarray(xyz))
    store = ShardedMapStore(mesh, per_shard=1024)
    store.set_model(cloud)

    q = (rng.random((64, 3)) - 0.5).astype(np.float32) * 100
    d2, gidx, valid = store.knn(jnp.asarray(q), k=4)

    # Oracle: global exact kNN.
    D = ((q[:, None, :].astype(np.float64) - xyz[None].astype(np.float64)) ** 2).sum(-1)
    oracle = np.sort(D, axis=1)[:, :4]
    np.testing.assert_allclose(np.asarray(d2), oracle, rtol=1e-4, atol=1e-3)
    # Returned indices point at the right coordinates in the shard-major cloud.
    got_xyz = np.asarray(store.cloud.xyz)[np.asarray(gidx)]
    dd = ((q[:, None, :] - got_xyz) ** 2).sum(-1)
    np.testing.assert_allclose(dd, np.asarray(d2), rtol=1e-3, atol=1e-3)


def test_sharded_checkpoint_elastic_resume():
    """Sharded checkpoint/resume (production restart story): save mid-run,
    restore on the SAME mesh (trajectory must continue identically) and on a
    DIFFERENT mesh size (elastic resume — the map repartitions by the same
    voxel-aligned block hash, so the continued trajectory matches to
    collective-reassociation tolerance)."""
    import dataclasses as dc
    from plo_tpu import config as cfgmod
    from plo_tpu.io import synthetic
    from plo_tpu.parallel import ShardedMapOdometry, get_mesh
    from plo_tpu.utils import checkpoint
    import tempfile, os

    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=600)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            target_mode="map",
            map=cfgmod.MapConfig(voxel_size=0.4, capacity=8192),
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(
                method="RANSAC", iterations=30,
                ransac=cfgmod.RANSACConfig(max_iterations=200,
                                           distance_threshold=0.2,
                                           final_solve_method="DRPM")),
            refresh_correspondences=False,
        ),
        sensor=cfgmod.SensorConfig(n_scans=16, azimuth_resolution=2.0),
    )
    from plo_tpu.io.synthetic import SyntheticWorld
    world = SyntheticWorld.corridor(seed=7, n_boxes=60, extent=30.0)
    scans, _ = synthetic.synthetic_sequence(
        9, n_scans=16, azimuth_steps=180, speed=0.4, yaw_rate=0.01, seed=3,
        world=world)

    mesh8 = get_mesh(8)
    full = ShardedMapOdometry(cfg, mesh8, capacity=4096, seed=0)
    for s in scans:
        full.process_scan(s)
    p_full = full.poses()

    half = ShardedMapOdometry(cfg, mesh8, capacity=4096, seed=0)
    for s in scans[:6]:
        half.process_scan(s)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        checkpoint.save_sharded(half, path)

        # (a) same mesh: bit-compatible continuation.
        res = ShardedMapOdometry(cfg, mesh8, capacity=4096, seed=0)
        checkpoint.load_sharded(res, path)
        for s in scans[6:]:
            res.process_scan(s)
        p_res = np.stack([f.pose for f in res.trajectory])
        d = np.linalg.norm(p_full[6:, :3, 3] - p_res[:, :3, 3], axis=1)
        assert d.max() < 1e-5, d

        # (b) elastic: restore on a 4-device mesh.
        res4 = ShardedMapOdometry(cfg, get_mesh(4), capacity=4096, seed=0)
        checkpoint.load_sharded(res4, path)
        for s in scans[6:]:
            res4.process_scan(s)
        p4 = np.stack([f.pose for f in res4.trajectory])
        d4 = np.linalg.norm(p_full[6:, :3, 3] - p4[:, :3, 3], axis=1)
        assert d4.max() < 5e-3, d4
