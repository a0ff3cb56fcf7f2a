import numpy as np
import jax.numpy as jnp

from plo_tpu.ops import neighbors


def clouds(rng, q=64, t=1000, scale=100.0):
    query = (rng.random((q, 3)) - 0.5) * scale
    target = (rng.random((t, 3)) - 0.5) * scale
    tvalid = rng.random(t) > 0.1
    return query.astype(np.float32), target.astype(np.float32), tvalid


def test_knn_exact_vs_oracle(rng):
    q, t, tv = clouds(rng)
    d2, idx, val = neighbors.knn(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv), k=8, radius=30.0, chunk=128)
    D = ((q[:, None, :].astype(np.float64) - t[None].astype(np.float64)) ** 2).sum(-1)
    D[:, ~tv] = np.inf
    order = np.argsort(D, axis=1)[:, :8]
    np.testing.assert_array_equal(np.asarray(idx), order)
    exp_valid = np.take_along_axis(D, order, 1) <= 30.0**2
    np.testing.assert_array_equal(np.asarray(val), exp_valid)


def test_knn_sorted_ascending(rng):
    q, t, tv = clouds(rng)
    d2, idx, val = neighbors.knn(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv), k=8)
    d = np.asarray(d2)
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_nearest_matches_knn1(rng):
    q, t, tv = clouds(rng)
    d2a, idxa, _ = neighbors.knn(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv), k=1)
    d2b, idxb, _ = neighbors.nearest(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv))
    np.testing.assert_array_equal(np.asarray(idxa)[:, 0], np.asarray(idxb))


def test_radius_excludes_far(rng):
    q = np.zeros((1, 3), np.float32)
    t = np.array([[0.5, 0, 0], [3.0, 0, 0]], np.float32)
    d2, idx, val = neighbors.knn(jnp.asarray(q), jnp.asarray(t), jnp.ones(2, bool), k=2, radius=1.0)
    assert np.asarray(val).tolist() == [[True, False]]


def test_projected_knn_oracle(rng):
    q, t, tv = clouds(rng, q=32, t=500, scale=20.0)
    n = rng.normal(size=(32, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = n.astype(np.float32)
    p, idx, val = neighbors.projected_knn(
        jnp.asarray(q), jnp.asarray(n), jnp.asarray(t), jnp.asarray(tv), 4,
        euclid_gate=8.0, proj_gate=3.0, chunk=64)
    diff = t[None] - q[:, None]
    crossp = np.cross(diff, n[:, None, :])
    projd = np.linalg.norm(crossp, axis=-1)
    dist = np.linalg.norm(diff, axis=-1)
    ok = tv[None, :] & (dist < 8.0) & (projd < 3.0)
    projd = np.where(ok, projd, np.inf)
    order = np.argsort(projd, axis=1)[:, :4]
    exp = np.take_along_axis(projd, order, 1)
    got = np.asarray(p)
    vmask = np.asarray(val)
    np.testing.assert_array_equal(np.isfinite(exp), vmask)
    np.testing.assert_allclose(exp[vmask], got[vmask], atol=1e-3)


def test_ring_neighbor_search_finds_adjacent():
    # Two rings of points along circles; adjacent-ring NN should be the
    # closest-azimuth point.
    W = 100
    theta = np.linspace(0, 2 * np.pi, W, endpoint=False)
    r0 = np.stack([10 * np.cos(theta), 10 * np.sin(theta), np.zeros(W)], 1)
    r1 = np.stack([10 * np.cos(theta), 10 * np.sin(theta), np.ones(W)], 1)
    xyz = np.concatenate([r0, r1]).astype(np.float32)
    ring = np.concatenate([np.zeros(W), np.ones(W)]).astype(np.int32)
    pos = np.concatenate([np.arange(W), np.arange(W)]).astype(np.int32)
    valid = np.ones(2 * W, bool)
    ring_start = np.array([0, W], np.int32)
    ring_count = np.array([W, W], np.int32)
    d2, flat, found = neighbors.ring_neighbor_search(
        jnp.asarray(xyz), jnp.asarray(ring), jnp.asarray(pos), jnp.asarray(valid),
        jnp.asarray(ring_start), jnp.asarray(ring_count), ring_offset=1, window=4)
    # Every ring-0 point's neighbor in ring 1 is the same azimuth index.
    np.testing.assert_array_equal(np.asarray(flat)[:W], W + np.arange(W))
    np.testing.assert_allclose(np.asarray(d2)[:W], 1.0, atol=1e-5)
    assert np.asarray(found)[:W].all()


def test_knn_approx_select_close_to_exact(rng):
    q, t, tv = clouds(rng)
    d2a, ia, va = neighbors.knn(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv), k=8, select="exact")
    d2b, ib, vb = neighbors.knn(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv), k=8, select="approx")
    # Recall of the approx selection (1.0 in measurements; allow tiny slack).
    recall = np.mean([
        len(set(np.asarray(ia)[i]) & set(np.asarray(ib)[i])) / 8 for i in range(len(q))
    ])
    assert recall > 0.95
