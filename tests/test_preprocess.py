import numpy as np
import jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.ops import preprocess


def make_scan(n_scans=64, azimuth_steps=360, seed=0):
    scans, _ = synthetic.synthetic_sequence(1, n_scans=n_scans, azimuth_steps=azimuth_steps, seed=seed)
    return scans[0]


def pad(raw, P=65536):
    pts = np.zeros((P, 4), np.float32)
    n = min(len(raw), P)
    pts[:n] = raw[:n]
    return pts, n


def test_range_gate():
    pts = np.zeros((8, 4), np.float32)
    pts[0, :3] = [1.0, 0, 0]       # below min range 2
    pts[1, :3] = [50.0, 0, -5]     # ok
    pts[2, :3] = [200.0, 0, 0]     # beyond max range
    pts[3, :3] = [np.nan, 0, 0]    # nan
    pts[4, :3] = [10.0, 3, -2]     # ok
    rc = preprocess.preprocess(jnp.asarray(pts), 5, cfgmod.SensorConfig(n_scans=64))
    assert int(rc.valid.sum()) == 2


def test_ring_assignment_hdl64_matches_reference_formula():
    raw = make_scan()
    pts, n = pad(raw)
    rc = preprocess.preprocess(jnp.asarray(pts), n, cfgmod.SensorConfig(n_scans=64))
    v = np.asarray(rc.valid)
    xyz = np.asarray(rc.xyz)[v]
    ring = np.asarray(rc.ring)[v]
    # Reference formula oracle (scan_registration.cpp:990-1003)
    angle = np.degrees(np.arctan2(xyz[:, 2], np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)))
    expected = np.where(angle >= -8.83,
                        np.floor((2.0 - angle) * 3.0 + 0.5),
                        32 + np.floor((-8.83 - angle) * 2.0 + 0.5)).astype(int)
    assert (ring == expected).mean() > 0.999
    assert ring.max() <= 50  # >50 discarded


def test_ring_sorted_and_counts_consistent():
    raw = make_scan()
    pts, n = pad(raw)
    rc = preprocess.preprocess(jnp.asarray(pts), n, cfgmod.SensorConfig(n_scans=64))
    v = np.asarray(rc.valid)
    assert v[: v.sum()].all() and not v[v.sum():].any()  # compact prefix
    ring = np.asarray(rc.ring)[v]
    assert (np.diff(ring) >= 0).all()
    counts = np.asarray(rc.ring_count)
    starts = np.asarray(rc.ring_start)
    np.testing.assert_array_equal(starts[1:], np.cumsum(counts)[:-1])
    # pos_in_ring
    pos = np.asarray(rc.pos_in_ring)[v]
    for r in range(0, 64, 13):
        sel = ring == r
        if sel.sum():
            np.testing.assert_array_equal(np.sort(pos[sel]), np.arange(sel.sum()))


def test_rel_time_monotonic_within_ring():
    raw = make_scan()
    pts, n = pad(raw)
    rc = preprocess.preprocess(jnp.asarray(pts), n, cfgmod.SensorConfig(n_scans=64))
    v = np.asarray(rc.valid)
    ring = np.asarray(rc.ring)[v]
    rel = np.asarray(rc.rel_time)[v]
    # Within each ring, arrival order ~ azimuth order -> relTime mostly increasing.
    r = ring[len(ring) // 2]
    sel = ring == r
    rr = rel[sel]
    frac_mono = (np.diff(rr) >= -1e-3).mean()
    assert frac_mono > 0.99
    assert rel.min() >= 0.0 and rel.max() <= 1.001
    # intensity = ring + 0.1 * relTime
    inten = np.asarray(rc.intensity)[v]
    np.testing.assert_allclose(inten, ring + 0.1 * rel, atol=1e-5)


def test_rasterize_range_image():
    raw = make_scan(azimuth_steps=360)
    pts, n = pad(raw)
    rc = preprocess.preprocess(jnp.asarray(pts), n, cfgmod.SensorConfig(n_scans=64))
    img, xyzg, relg, occ, srcg = preprocess.rasterize_range_image(rc, 64, 400)
    occ_np = np.asarray(occ)
    img_np = np.asarray(img)
    assert occ_np.mean() > 0.3
    # Occupied cells carry the 2D range of their winning point.
    xyz = np.asarray(xyzg)[occ_np]
    r2d = np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    np.testing.assert_allclose(r2d, img_np[occ_np], atol=1e-4)
    assert np.isinf(img_np[~occ_np]).all()


def test_preprocess_unsorted_equivalent_raster():
    """sort=False (arrival-order layout) must rasterize to the identical
    range image as the ring-sorted layout — the grid paths' fast preprocess."""
    import jax.numpy as jnp
    from plo_tpu.io import synthetic

    scans, _ = synthetic.synthetic_sequence(1, n_scans=64, azimuth_steps=360, seed=5)
    P = 32768
    pts = np.zeros((P, 4), np.float32)
    n = min(len(scans[0]), P)
    pts[:n] = scans[0][:n]
    sensor = cfgmod.SensorConfig(n_scans=64)
    rc_s = preprocess.preprocess(jnp.asarray(pts), n, sensor, sort=True)
    rc_u = preprocess.preprocess(jnp.asarray(pts), n, sensor, sort=False)
    assert int(rc_s.valid.sum()) == int(rc_u.valid.sum())
    np.testing.assert_array_equal(np.asarray(rc_s.ring_count), np.asarray(rc_u.ring_count))
    img_s, xyz_s, rel_s, occ_s, _ = preprocess.rasterize_range_image(rc_s, 64, 360)
    img_u, xyz_u, rel_u, occ_u, _ = preprocess.rasterize_range_image(rc_u, 64, 360)
    np.testing.assert_array_equal(np.asarray(occ_s), np.asarray(occ_u))
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_u))
    # Winning point per cell may differ only between exact-tie points.
    np.testing.assert_allclose(np.asarray(xyz_s), np.asarray(xyz_u), atol=1e-6)
