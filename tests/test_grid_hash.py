import numpy as np
import jax.numpy as jnp

from plo_tpu.io import synthetic
from plo_tpu.ops import grid_hash, neighbors


def test_grid_hash_exactness_small(rng):
    """On a cloud with sparse cells (< m points each), grid-hash kNN within
    radius must match the exact engine."""
    t = 2000
    xyz = ((rng.random((t, 3)) - 0.5) * 60).astype(np.float32)
    valid = rng.random(t) > 0.1
    r = 2.0
    gh = grid_hash.build(jnp.asarray(xyz), jnp.asarray(valid), r, n_buckets=8192)
    q = ((rng.random((128, 3)) - 0.5) * 50).astype(np.float32)

    d2a, ia, va = grid_hash.knn(gh, jnp.asarray(q), k=5, radius=r, m=32)
    d2b, ib, vb = neighbors.knn(jnp.asarray(q), jnp.asarray(xyz), jnp.asarray(valid),
                                k=5, radius=r)
    va, vb = np.asarray(va), np.asarray(vb)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(np.asarray(ia)[va], np.asarray(ib)[vb])
    np.testing.assert_allclose(np.asarray(d2a)[va], np.asarray(d2b)[vb], rtol=1e-5)


def test_grid_hash_recall_on_voxel_map():
    """Recall vs the exact engine on the grid hash's intended domain: a
    voxel-downsampled map (bounded per-cell occupancy). Raw near-field scan
    rings put 1000+ points in a 1 m cell, which the per-bucket cap truncates —
    that regime belongs to the exact chunked engine (see module docstring)."""
    from plo_tpu.cloud import PointCloud
    from plo_tpu.ops.voxel import voxel_downsample

    scans, _ = synthetic.synthetic_sequence(1, n_scans=64, azimuth_steps=900, seed=4)
    full = scans[0][:, :3].astype(np.float32)
    cloud = PointCloud.from_xyz(jnp.asarray(full))
    ds = voxel_downsample(cloud, 0.3, out_size=32768)
    raw = np.asarray(ds.xyz)[np.asarray(ds.valid)]
    valid = np.ones(len(raw), bool)
    r = 1.0
    gh = grid_hash.build(jnp.asarray(raw), jnp.asarray(valid), r, n_buckets=1 << 17)
    rng = np.random.default_rng(0)
    q = raw[rng.choice(len(raw), 512, replace=False)] + 0.05

    d2a, ia, va = grid_hash.knn(gh, jnp.asarray(q), k=10, radius=r, m=192)
    d2b, ib, vb = neighbors.knn(jnp.asarray(q), jnp.asarray(raw), jnp.asarray(valid),
                                k=10, radius=r)
    va, vb = np.asarray(va), np.asarray(vb)
    ia, ib = np.asarray(ia), np.asarray(ib)
    hits = total = 0
    for i in range(len(q)):
        exact = set(ib[i][vb[i]])
        got = set(ia[i][va[i]])
        total += len(exact)
        hits += len(exact & got)
    recall = hits / max(total, 1)
    assert recall >= 0.995, f"recall {recall}"
    # Every returned neighbor is genuinely within radius (no false positives).
    for i in range(0, len(q), 37):
        for j, v in enumerate(va[i]):
            if v:
                d = np.linalg.norm(raw[ia[i, j]] - q[i])
                assert d <= r + 1e-4


def test_grid_hash_radius_gate(rng):
    xyz = np.array([[0, 0, 0], [5, 0, 0]], np.float32)
    gh = grid_hash.build(jnp.asarray(xyz), jnp.ones(2, bool), 1.0, n_buckets=64)
    d2, idx, valid = grid_hash.nearest(gh, jnp.asarray(np.array([[0.2, 0, 0]], np.float32)), 1.0)
    assert bool(valid[0]) and int(idx[0]) == 0
    # Far query: nothing within radius (the 27-cell window can't even see it).
    d2, idx, valid = grid_hash.nearest(gh, jnp.asarray(np.array([[2.5, 0, 0]], np.float32)), 1.0)
    assert not bool(valid[0])


def test_voxel_downsample(rng):
    from plo_tpu.cloud import PointCloud
    from plo_tpu.ops.voxel import voxel_downsample
    import dataclasses as dc

    # Points clustered in 4 known voxels.
    base = np.array([[0.5, 0.5, 0.5], [5.5, 0.5, 0.5], [0.5, 5.5, 0.5], [5.5, 5.5, 0.5]], np.float32)
    pts = np.repeat(base, 25, axis=0) + rng.normal(0, 0.05, (100, 3)).astype(np.float32)
    cloud = PointCloud.from_xyz(jnp.asarray(pts))
    cloud = dc.replace(cloud, normal=jnp.asarray(np.tile([0, 0, 1.0], (100, 1)).astype(np.float32)))
    ds = voxel_downsample(cloud, 1.0, out_size=16)
    v = np.asarray(ds.valid)
    assert v.sum() == 4
    got = np.asarray(ds.xyz)[v]
    for b in base:
        d = np.linalg.norm(got - b, axis=1).min()
        assert d < 0.1  # centroid near cluster center
    nn = np.asarray(ds.normal)[v]
    assert (nn[:, 2] > 0.99).all()
