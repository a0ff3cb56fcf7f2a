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
