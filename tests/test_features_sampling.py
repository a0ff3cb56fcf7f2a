import numpy as np
import jax
import jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.ops import features, preprocess, sampling


def preprocessed_scan(seed=0):
    scans, _ = synthetic.synthetic_sequence(1, n_scans=64, azimuth_steps=360, seed=seed)
    raw = scans[0]
    P = 24576
    pts = np.zeros((P, 4), np.float32)
    n = min(len(raw), P)
    pts[:n] = raw[:n]
    return preprocess.preprocess(jnp.asarray(pts), n, cfgmod.SensorConfig(n_scans=64))


def test_geometric_features_oracle(rng):
    ev = np.sort(rng.random((100, 3)).astype(np.float32), axis=1)[:, ::-1]
    f = np.asarray(features.geometric_features(jnp.asarray(ev)))
    l1, l2, l3 = ev[:, 0], ev[:, 1], ev[:, 2]
    np.testing.assert_allclose(f[:, 0], l1 + l2 + l3, rtol=1e-5)
    np.testing.assert_allclose(f[:, 1], np.cbrt(l1 * l2 * l3), rtol=1e-4)
    np.testing.assert_allclose(f[:, 3], (l1 - l3) / l1, rtol=1e-4)
    np.testing.assert_allclose(f[:, 5], (l2 - l3) / l1, rtol=1e-4)
    np.testing.assert_allclose(f[:, 7], l3 / l1, rtol=1e-4)


def test_ring_curvature_flat_vs_edge():
    rc = preprocessed_scan()
    curv = np.asarray(features.ring_curvature(rc, window_size=5))
    v = np.asarray(rc.valid)
    assert np.isfinite(curv).all()
    assert (curv[~v] == 0).all()
    # Flat regions dominate the synthetic world: median curvature small.
    cv = curv[v & (curv > 0)]
    assert len(cv) > 1000


def test_random_sampling_deterministic_and_bounded():
    rc = preprocessed_scan()
    cand = np.asarray(rc.valid)
    key = jax.random.PRNGKey(7)
    idx, valid = sampling.random_sampling(jnp.asarray(cand), key, 2000)
    idx2, valid2 = sampling.random_sampling(jnp.asarray(cand), key, 2000)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    assert valid.sum() == min(2000, cand.sum())
    assert cand[np.asarray(idx)[np.asarray(valid)]].all()


def test_spherical_bins_ranges(rng):
    n = rng.normal(size=(1000, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    bins = np.asarray(sampling.spherical_bins(jnp.asarray(n.astype(np.float32)), 8, 8))
    assert bins.min() >= 0 and bins.max() < 64


def test_normal_sampling_bin_caps():
    rc = preprocessed_scan()
    # Fake normals: all pointing +z -> single bin; cap must bind.
    p = rc.capacity
    normals = np.tile(np.array([0, 0, 1.0], np.float32), (p, 1))
    cand = np.asarray(rc.valid)
    idx, valid = sampling.normal_sampling(
        jnp.asarray(normals), jnp.asarray(cand), jax.random.PRNGKey(0),
        azimuth_bins=8, elevation_bins=8, min_points_per_bin=20,
        max_points_per_bin=100, out_size=8 * 8 * 100)
    assert int(valid.sum()) == 100  # one bin, capped at max_points_per_bin


def test_normal_sampling_min_bin_drop():
    normals = np.zeros((64, 3), np.float32)
    normals[:, 2] = 1.0
    cand = np.zeros(64, bool)
    cand[:10] = True  # 10 < min_points_per_bin=20
    idx, valid = sampling.normal_sampling(
        jnp.asarray(normals), jnp.asarray(cand), jax.random.PRNGKey(0),
        8, 8, 20, 100, out_size=6400)
    assert int(valid.sum()) == 0


def test_three_axis_sampling_shape_and_candidates():
    rc = preprocessed_scan()
    p = rc.capacity
    xyz = np.asarray(rc.xyz)
    normals = np.tile(np.array([0, 0, 1.0], np.float32), (p, 1))
    ev = np.tile(np.array([1.0, 0.5, 0.01], np.float32), (p, 1))
    cand = np.asarray(rc.valid)
    idx, valid = sampling.three_axis_sampling(
        jnp.asarray(xyz), jnp.asarray(normals), jnp.asarray(ev),
        jnp.asarray(cand), points_per_list=50)
    assert idx.shape == (450,)
    assert valid.sum() == 450
    assert cand[np.asarray(idx)].all()


def test_fps_spreads_points(rng):
    # FPS on a line: samples should include both extremes.
    n = 200
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = np.linspace(0, 100, n)
    idx = sampling.farthest_point_sampling(jnp.asarray(xyz), jnp.ones(n, bool),
                                           jax.random.PRNGKey(3), 4)
    picked = np.asarray(idx)
    assert len(np.unique(picked)) == 4
    xs = xyz[picked, 0]
    assert xs.max() > 95 and xs.min() < 5


def test_major_axis_sampling_runs():
    rc = preprocessed_scan(seed=0)
    rc2 = preprocessed_scan(seed=0)  # same scene as "last frame"
    p = rc.capacity
    normals = np.tile(np.array([0, 0, 1.0], np.float32), (p, 1))
    cand = np.asarray(rc.valid)
    idx, valid = sampling.major_axis_sampling(
        rc.xyz, jnp.asarray(normals), jnp.asarray(cand),
        rc2.xyz, rc2.valid, jax.random.PRNGKey(0),
        r=0.5, r_proj=1.5, max_total_points=2000,
        azimuth_bins=8, elevation_bins=8, min_points_per_bin=20,
        max_points_per_bin=200, out_size=2000)
    nv = int(valid.sum())
    assert 0 < nv <= 2000
    assert cand[np.asarray(idx)[np.asarray(valid)]].all()


def test_fps_rank_within_bins_spreads(rng):
    """FPS ranks within each bin follow farthest-first order: the top-ranked
    subset must span the bin's extent better than a random subset."""
    n = 600
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = np.linspace(0, 100, n)
    bins = (np.arange(n) % 2).astype(np.int32)  # both bins span the full line
    xyz[bins == 1, 1] = 50.0
    member = np.ones(n, bool)
    rank, counts = sampling.fps_rank_within_bins(
        jnp.asarray(xyz), jnp.asarray(bins), jnp.asarray(member),
        jax.random.PRNGKey(0), n_bins=2, bin_capacity=512, max_rank=8)
    rank = np.asarray(rank)
    np.testing.assert_array_equal(np.asarray(counts), [300, 300])
    for b in range(2):
        sel = xyz[(bins == b) & (rank < 8), 0]
        assert len(sel) == 8
        # Farthest-first picks span most of the segment and are well spread
        # (min pairwise gap > 5 — a uniform random pick of 8/300 would
        # frequently produce near-duplicates).
        assert sel.max() - sel.min() > 80
        assert np.diff(np.sort(sel)).min() > 5


def test_major_axis_fps_strategy_runs():
    rc = preprocessed_scan(seed=0)
    rc2 = preprocessed_scan(seed=0)
    p = rc.capacity
    normals = np.tile(np.array([0, 0, 1.0], np.float32), (p, 1))
    cand = np.asarray(rc.valid)
    idx, valid = sampling.major_axis_sampling(
        rc.xyz, jnp.asarray(normals), jnp.asarray(cand),
        rc2.xyz, rc2.valid, jax.random.PRNGKey(0),
        r=0.5, r_proj=1.5, max_total_points=2000,
        azimuth_bins=8, elevation_bins=8, min_points_per_bin=20,
        max_points_per_bin=200, out_size=2000, strategy="FPS")
    nv = int(valid.sum())
    assert 0 < nv <= 2000


def test_cylinder_stats_oracle():
    """The MXU (matmul-form) cylinder pass must match a float64 coordinate-
    difference oracle of the reference's gates (scan_registration.cpp:676-701)
    away from the gate boundaries: counts exact, distance sums to f32
    accumulation tolerance."""
    from plo_tpu.ops.sampling import cylinder_stats

    rng = np.random.default_rng(11)
    q = rng.uniform(-60, 60, (257, 3)).astype(np.float32)
    n = rng.normal(size=(257, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t = rng.uniform(-60, 60, (4001, 3)).astype(np.float32)
    # Plant guaranteed in-cylinder neighbors for 50 queries.
    t[:50] = q[:50] + (n[:50] * rng.uniform(0.1, 0.4, (50, 1))).astype(np.float32)
    tv = np.ones(4001, bool); tv[::17] = False
    r_proj, r = 1.5, 0.5

    d = q[:, None, :].astype(np.float64) - t[None, :, :].astype(np.float64)
    d2 = (d * d).sum(-1)
    cr = np.cross(d, np.broadcast_to(n[:, None, :], d.shape).astype(np.float64))
    p2 = (cr * cr).sum(-1)
    ok = tv[None, :] & (d2 < r_proj**2) & (p2 < r**2)
    # Exclude gate-boundary pairs (within the f32 matmul cancellation band):
    # count parity is only meaningful away from the threshold.
    band = (np.abs(d2 - r_proj**2) < 5e-3) | (np.abs(p2 - r**2) < 5e-3)
    cnt_o = ok.sum(1)
    sum_o = np.where(ok, np.sqrt(d2), 0.0).sum(1)

    cnt, dsum = cylinder_stats(jnp.asarray(q), jnp.asarray(n), jnp.asarray(t),
                               jnp.asarray(tv), r_proj, r, chunk=1024)
    cnt, dsum = np.asarray(cnt), np.asarray(dsum)
    clean = ~band.any(axis=1)
    assert clean.sum() > 150
    np.testing.assert_array_equal(cnt[clean], cnt_o[clean])
    # sqrt amplifies the matmul-form cancellation at small d2
    # (err ~ 1e-3 m^2 / (2 sqrt(d2))): mm-level on a weight statistic.
    np.testing.assert_allclose(dsum[clean], sum_o[clean], rtol=0.05, atol=5e-3)


def test_major_axis_fps_quota_never_exceeds_total():
    """FPS-strategy quotas are clamped to the rank range: bins bigger than the
    traversal capacity must not leak sentinel-ranked members past the quota
    gate (sum of selections stays <= max_total_points)."""
    from plo_tpu.ops import sampling

    rng = np.random.default_rng(12)
    p = 6000
    # One dominant bin: nearly all normals point +z -> its quota ~ max_total.
    nrm = np.tile(np.array([0.01, 0.0, 1.0], np.float32), (p, 1))
    nrm[:300] = rng.normal(size=(300, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    xyz = rng.uniform(-30, 30, (p, 3)).astype(np.float32)
    cand = np.ones(p, bool)
    last = rng.uniform(-30, 30, (4096, 3)).astype(np.float32)
    idx, valid = sampling.major_axis_sampling(
        jnp.asarray(xyz), jnp.asarray(nrm), jnp.asarray(cand),
        jnp.asarray(last), jnp.ones(4096, bool), jax.random.PRNGKey(0),
        r=0.5, r_proj=1.5, max_total_points=2000, azimuth_bins=8,
        elevation_bins=8, min_points_per_bin=20, max_points_per_bin=200,
        out_size=6400, strategy="FPS")
    assert int(np.asarray(valid).sum()) <= 2000


def test_compact_indices_scatter_matches_sort():
    """The scatter (cumsum + drop-mode scatter) compact form must agree with
    the argsort form on the kept prefix and the valid mask for every regime:
    under-full, exactly-full, and overflowing `size` (only the idx values
    under valid=False padding may differ — both forms keep them in-bounds)."""
    import numpy as np
    import jax.numpy as jnp
    from plo_tpu.ops import sampling
    rng = np.random.default_rng(3)
    for p, size, density in [(1000, 300, 0.3), (1000, 1000, 0.99),
                             (257, 64, 0.9), (64, 64, 0.0), (7, 3, 1.0)]:
        keep = jnp.asarray(rng.random(p) < density)
        orig = sampling._COMPACT_SCATTER
        try:
            sampling._COMPACT_SCATTER = True
            i_sc, v_sc = sampling.compact_indices(keep, size)
            sampling._COMPACT_SCATTER = False
            i_so, v_so = sampling.compact_indices(keep, size)
        finally:
            sampling._COMPACT_SCATTER = orig
        np.testing.assert_array_equal(np.asarray(v_sc), np.asarray(v_so))
        m = min(size, int(jnp.sum(keep)))
        np.testing.assert_array_equal(np.asarray(i_sc[:m]), np.asarray(i_so[:m]))
        assert bool(jnp.all((i_sc >= 0) & (i_sc < p)))


def test_rank_within_bins_packed_matches_lexsort():
    """PLO_RANK=packed parity: the single packed-i32-key stable argsort must
    reproduce the two-key lexsort ranks except at 2^-24 score-quantization
    ties (none expected at these sizes; uniform scores collide with
    probability ~n^2/2^25 per bin)."""
    import numpy as np
    import jax.numpy as jnp
    from plo_tpu.ops import sampling
    rng = np.random.default_rng(11)
    p, nb = 8192, 64
    bins = jnp.asarray(rng.integers(0, nb, p).astype(np.int32))
    member = jnp.asarray(rng.random(p) < 0.6)
    scores = jnp.asarray(rng.random(p).astype(np.float32))
    orig = sampling._RANK_PACKED
    try:
        sampling._RANK_PACKED = False
        r_lex, c_lex = sampling._rank_within_bins(bins, member, scores, nb)
        sampling._RANK_PACKED = True
        r_pk, c_pk = sampling._rank_within_bins(bins, member, scores, nb)
    finally:
        sampling._RANK_PACKED = orig
    np.testing.assert_array_equal(np.asarray(c_lex), np.asarray(c_pk))
    assert int(jnp.sum(r_lex != r_pk)) <= 4
