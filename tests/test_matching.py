import dataclasses

import numpy as np
import jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.cloud import PointCloud
from plo_tpu.ops import matching


def plane_target(rng, n=2000, extent=20.0, z=0.0):
    """Target cloud: points on the z=z plane with +z normals."""
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, :2] = (rng.random((n, 2)) - 0.5) * extent
    xyz[:, 2] = z
    cloud = PointCloud.from_xyz(jnp.asarray(xyz))
    normal = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
    return dataclasses.replace(cloud, normal=jnp.asarray(normal))


def source_above_plane(rng, m=200, height=0.3, extent=10.0):
    xyz = np.zeros((m, 3), np.float32)
    xyz[:, :2] = (rng.random((m, 2)) - 0.5) * extent
    xyz[:, 2] = height
    cloud = PointCloud.from_xyz(jnp.asarray(xyz))
    normal = np.tile(np.array([0, 0, 1.0], np.float32), (m, 1))
    return dataclasses.replace(cloud, normal=jnp.asarray(normal))


def test_plane_icp_projects_onto_plane(rng):
    tgt = plane_target(rng)
    src = source_above_plane(rng, height=0.3)
    cfg = cfgmod.PlaneICPConfig(r=1.5)
    res = matching.plane_icp_project(src, tgt, cfg)
    v = np.asarray(res.valid)
    assert v.sum() > 150
    y = np.asarray(res.y)[v]
    np.testing.assert_allclose(y[:, 2], 0.0, atol=1e-5)  # projected onto plane
    x = np.asarray(src.xyz)[v]
    np.testing.assert_allclose(y[:, :2], x[:, :2], atol=1e-5)  # straight down


def test_plane_icp_radius_gate(rng):
    tgt = plane_target(rng)
    src = source_above_plane(rng, height=5.0)  # farther than r=1.5 from plane points
    cfg = cfgmod.PlaneICPConfig(r=1.5)
    res = matching.plane_icp_project(src, tgt, cfg)
    assert int(res.valid.sum()) == 0
    assert int(res.counters["too_far"]) == 200


def test_plane_icp_angle_constraint(rng):
    tgt = plane_target(rng)
    src = source_above_plane(rng, height=0.3)
    # Source normals tilted 90 deg -> all rejected by 30 deg constraint.
    src = dataclasses.replace(src, normal=jnp.asarray(
        np.tile(np.array([1.0, 0, 0], np.float32), (src.capacity, 1))))
    cfg = cfgmod.PlaneICPConfig(r=1.5)
    res = matching.plane_icp_project(src, tgt, cfg)
    assert int(res.valid.sum()) == 0
    assert int(res.counters["normal_constraint"]) == 200


def test_imls_height_on_plane(rng):
    """IMLS height above a perfect plane equals the z offset -> y lands on
    the plane."""
    tgt = plane_target(rng, n=4000)
    src = source_above_plane(rng, m=100, height=0.4)
    cfg = cfgmod.IMLSConfig(h=1.0, r=3.0)
    res = matching.imls_project(src, tgt, cfg)
    v = np.asarray(res.valid)
    assert v.sum() > 50
    y = np.asarray(res.y)[v]
    np.testing.assert_allclose(y[:, 2], 0.0, atol=1e-3)


def test_imls_anchor_h_gate(rng):
    tgt = plane_target(rng, n=4000)
    src = source_above_plane(rng, m=100, height=2.0)  # within r=3 but > h=1
    cfg = cfgmod.IMLSConfig(h=1.0, r=3.0)
    res = matching.imls_project(src, tgt, cfg)
    assert int(res.valid.sum()) == 0
    assert int(res.counters["too_far"]) == 100


def test_imls_projected_distance_mode(rng):
    tgt = plane_target(rng, n=4000)
    src = source_above_plane(rng, m=100, height=0.4)
    cfg = cfgmod.IMLSConfig(
        h=1.0, r=3.0,
        use_projected_distance=cfgmod.ProjectedDistanceConfig(enabled=True, r_proj=0.8),
    )
    # Projected distance of plane points below the source (normal +z) is the
    # horizontal offset; gates: ||d|| < r_proj=0.8 and proj < r=3.
    res = matching.imls_project(src, tgt, cfg)
    v = np.asarray(res.valid)
    assert v.sum() > 30
    y = np.asarray(res.y)[v]
    np.testing.assert_allclose(y[:, 2], 0.0, atol=5e-3)


def test_precompute_target_normals_plane(rng):
    tgt = plane_target(rng, n=2000)
    nrm, ok = matching.precompute_target_normals(tgt.xyz, tgt.valid, r_normal=2.0, k=10)
    okn = np.asarray(ok)
    assert okn.sum() > 1500
    n = np.asarray(nrm)[okn]
    assert (np.abs(n[:, 2]) > 0.999).all()  # plane normal +-z (no flip in ref)


def test_imls_masked_source_stays_masked(rng):
    tgt = plane_target(rng)
    src = source_above_plane(rng, m=100, height=0.3)
    mask = np.ones(100, bool)
    mask[::2] = False
    src = dataclasses.replace(src, valid=jnp.asarray(mask))
    res = matching.imls_project(src, tgt, cfgmod.IMLSConfig(h=1.0, r=3.0))
    v = np.asarray(res.valid)
    assert not v[::2].any()


def test_imls_cached_matches_full_at_search_pose(rng):
    """Freeze mode: imls_search + imls_project_cached at the search pose must
    reproduce the full imls_project (euclidean mode) — same survivors, same
    correspondences."""
    n = 3000
    xyz = (rng.random((n, 3)) - 0.5).astype(np.float32) * 24
    xyz[:, 2] = np.sin(xyz[:, 0] * 0.4).astype(np.float32) * 0.5
    tgt = PointCloud.from_xyz(jnp.asarray(xyz))
    nrm = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
    tgt = dataclasses.replace(tgt, normal=jnp.asarray(nrm))
    src = source_above_plane(rng, m=400, height=0.2, extent=20.0)
    cfg = cfgmod.IMLSConfig(h=1.0, r=3.0)

    full = matching.imls_project(src, tgt, cfg, knn_select="exact")
    cache = matching.imls_search(src, tgt, cfg, knn_select="exact")
    cached = matching.imls_project_cached(src, tgt, cfg, cache)

    np.testing.assert_array_equal(np.asarray(full.valid), np.asarray(cached.valid))
    v = np.asarray(full.valid)
    np.testing.assert_allclose(np.asarray(full.y)[v], np.asarray(cached.y)[v],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(full.normal)[v],
                               np.asarray(cached.normal)[v], rtol=0, atol=1e-6)
    for k in full.counters:
        assert int(full.counters[k]) == int(cached.counters[k]), k


def test_imls_cached_tracks_small_pose_update(rng):
    """After a small source shift the cached evaluation stays within the
    re-gated candidate set and still projects onto the surface."""
    tgt = plane_target(rng, n=4000)
    src = source_above_plane(rng, m=300, height=0.25)
    cfg = cfgmod.IMLSConfig(h=1.0, r=3.0)
    cache = matching.imls_search(src, tgt, cfg, knn_select="exact")
    shifted = dataclasses.replace(src, xyz=src.xyz + jnp.asarray([0.02, -0.01, 0.03]))
    res = matching.imls_project_cached(shifted, tgt, cfg, cache)
    v = np.asarray(res.valid)
    assert v.sum() > 200
    y = np.asarray(res.y)[v]
    np.testing.assert_allclose(y[:, 2], 0.0, atol=1e-4)  # heights land on the plane
