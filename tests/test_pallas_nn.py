"""Pallas anchor-search kernels vs the XLA reference engine (interpret mode on
CPU; the same kernels compile natively on TPU)."""
import jax
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


def test_pallas_fps_ranks_matches_xla_loop(rng):
    """The batched-bin FPS kernel vs the XLA while_loop form it replaces
    (ops.sampling.fps_rank_within_bins): identical rank tables on random
    bins, both with a full traversal and with an early `needed` stop."""
    from plo_tpu.ops import sampling

    p, n_bins, cap = 3000, 16, 256
    xyz = rng.uniform(-20, 20, (p, 3)).astype(np.float32)
    bins = rng.integers(0, n_bins, p).astype(np.int32)
    member = rng.random(p) < 0.7
    key = jax.random.PRNGKey(3)

    for needed in (None, 40):
        # Force the XLA form via the module toggle (import-time constant, so
        # patch the symbol, not the env).
        old = sampling._PALLAS_FPS
        sampling._PALLAS_FPS = False
        try:
            r_xla, c_xla = sampling.fps_rank_within_bins(
                jnp.asarray(xyz), jnp.asarray(bins), jnp.asarray(member), key,
                n_bins, bin_capacity=cap, max_rank=200, needed=needed)
        finally:
            sampling._PALLAS_FPS = old
        # The kernel in interpret mode through the same table construction:
        # replicate the prelude, then call fps_ranks directly.
        scores = jax.random.uniform(key, (p,))
        rank0, _ = sampling._rank_within_bins(
            jnp.asarray(bins), jnp.asarray(member), scores, n_bins)
        slot_ok = jnp.asarray(member) & (rank0 < cap)
        dest = jnp.where(slot_ok, jnp.clip(jnp.asarray(bins), 0, n_bins - 1) * cap + rank0,
                         n_bins * cap)
        table_xyz = (jnp.zeros((n_bins * cap + 1, 3), jnp.float32)
                     .at[dest].set(jnp.asarray(xyz)).reshape(-1, 3)[:-1]
                     .reshape(n_bins, cap, 3))
        table_occ = (jnp.zeros((n_bins * cap + 1,), jnp.float32)
                     .at[dest].set(1.0)[:-1].reshape(n_bins, cap))
        src_index = (jnp.full((n_bins * cap + 1,), p, jnp.int32)
                     .at[dest].set(jnp.arange(p, dtype=jnp.int32))[:-1]
                     .reshape(n_bins, cap))
        n_steps = 200 if needed is None else min(needed, 200)
        bin_ranks = pallas_nn.fps_ranks(table_xyz, table_occ,
                                        jnp.asarray(n_steps, jnp.int32),
                                        max_rank=200, interpret=True)
        flat = jnp.full((p + 1,), 200, jnp.int32).at[src_index.reshape(-1)].set(
            bin_ranks.reshape(-1))[:p]
        r_pallas = jnp.where(jnp.asarray(member), flat, 200)
        np.testing.assert_array_equal(np.asarray(r_xla), np.asarray(r_pallas))


def test_pallas_cylinder_live_prefix_matches_full(rng):
    """t_live tile skipping is exact: with the target valid-prefix-compacted
    (the ring counting-sort layout of ops/preprocess.py), bounding the loop
    at max(valid index)+1 must reproduce the full-capacity result bit-for-bit
    — skipped tiles hold only +inf padding that can never pass the d2 gate."""
    q, t, _ = clouds(rng, q=300, t=4096, scale=20.0)
    n = rng.normal(size=(300, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    live = 1800  # valid prefix, then padding: two whole tail tiles to skip
    tv = np.arange(4096) < live
    full_c, full_s = pallas_nn.cylinder_stats(
        jnp.asarray(q), jnp.asarray(n), jnp.asarray(t), jnp.asarray(tv),
        1.5, 0.5, interpret=True)
    live_c, live_s = pallas_nn.cylinder_stats(
        jnp.asarray(q), jnp.asarray(n), jnp.asarray(t), jnp.asarray(tv),
        1.5, 0.5, t_live=jnp.asarray(live, jnp.int32), interpret=True)
    np.testing.assert_array_equal(np.asarray(full_c), np.asarray(live_c))
    np.testing.assert_array_equal(np.asarray(full_s), np.asarray(live_s))
