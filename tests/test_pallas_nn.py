"""Pallas anchor-search kernels vs the XLA reference engine (interpret mode on
CPU; the same kernels compile natively on TPU)."""
import numpy as np
import jax.numpy as jnp

from plo_tpu.ops import neighbors, pallas_nn


def clouds(rng, q=300, t=3000, scale=100.0):
    query = ((rng.random((q, 3)) - 0.5) * scale).astype(np.float32)
    target = ((rng.random((t, 3)) - 0.5) * scale).astype(np.float32)
    tvalid = rng.random(t) > 0.15
    return query, target, tvalid


def test_pallas_nearest_matches_xla(rng):
    q, t, tv = clouds(rng)
    d2a, ia, va = neighbors.nearest(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv), radius=40.0)
    d2b, ib, vb = pallas_nn.nearest(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv),
                                    radius=40.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_pallas_nearest_all_invalid(rng):
    q, t, _ = clouds(rng, q=10, t=100)
    tv = np.zeros(100, bool)
    d2, idx, val = pallas_nn.nearest(jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv),
                                     interpret=True)
    assert not np.asarray(val).any()


def test_pallas_projected_matches_xla(rng):
    q, t, tv = clouds(rng, q=200, t=2000, scale=30.0)
    n = rng.normal(size=(200, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    pa, ia, va = neighbors.projected_argmin(jnp.asarray(q), jnp.asarray(n),
                                            jnp.asarray(t), jnp.asarray(tv), 10.0, 4.0)
    pb, ib, vb = pallas_nn.projected_argmin(jnp.asarray(q), jnp.asarray(n),
                                            jnp.asarray(t), jnp.asarray(tv), 10.0, 4.0,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    m = np.asarray(va)
    np.testing.assert_array_equal(np.asarray(ia)[m], np.asarray(ib)[m])
    np.testing.assert_allclose(np.asarray(pa)[m], np.asarray(pb)[m], rtol=1e-4)


def test_pallas_cylinder_stats_matches_xla(rng):
    from plo_tpu.ops import sampling
    q, t, tv = clouds(rng, q=500, t=4000, scale=20.0)
    n = rng.normal(size=(500, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    ca, sa = sampling.cylinder_stats(jnp.asarray(q), jnp.asarray(n),
                                     jnp.asarray(t), jnp.asarray(tv), 1.5, 0.5)
    cb, sb = pallas_nn.cylinder_stats(jnp.asarray(q), jnp.asarray(n),
                                      jnp.asarray(t), jnp.asarray(tv), 1.5, 0.5,
                                      interpret=True)
    # Identical gate math; only the f32 accumulation order differs (tile
    # widths), so counts match exactly away from gate boundaries and sums to
    # f32 tolerance.
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=2e-5, atol=1e-4)
