"""Pallas TPU kernels for the anchor searches — the hottest single op of the
back-end (SURVEY.md §3.4: the k=1 anchor scan runs per source point per ICP
iteration).

Design: queries are processed in blocks of BQ (grid dim 0); the target cloud
streams through VMEM in BT-wide tiles via an inner fori_loop. Distances are
computed coordinate-wise on the VPU ([BQ, BT] tiles; the matmul trick is
deliberately avoided — see ops/neighbors._pairwise_d2 for the f32
cancellation analysis) and a running (min, argmin) pair lives in VMEM
scratch. One pass over the target per query block, no [Q, T] materialization,
no top-k sort — this is the memory-bound speed-of-light shape for the op:
read T once per query block.

Layout notes: target coordinates are passed transposed [3, T] so the point
dimension is the 128-lane axis; T is padded to a BT multiple with +inf
sentinels by the host wrapper.

The public wrappers return exactly `ops.neighbors.nearest` /
`projected_argmin` semantics and are validated against them in tests (CPU via
interpret mode, TPU natively).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 1024  # query block (f32 1-D outputs tile at 1024 on TPU)
BT = 1024  # target tile (lane-friendly multiple of 128)


def _nearest_kernel(q_ref, t_ref, o_d2_ref, o_idx_ref):
    """q_ref: [3, BQ] query block; t_ref: [3, T] full target (ANY/HBM-resident,
    sliced per tile); outputs [BQ] best d2 / index."""
    n_tiles = t_ref.shape[1] // BT

    qx = q_ref[0, :].reshape(BQ, 1)
    qy = q_ref[1, :].reshape(BQ, 1)
    qz = q_ref[2, :].reshape(BQ, 1)

    def body(i, carry):
        best_d2, best_idx = carry
        base = i * BT
        tx = t_ref[0, pl.ds(base, BT)].reshape(1, BT)
        ty = t_ref[1, pl.ds(base, BT)].reshape(1, BT)
        tz = t_ref[2, pl.ds(base, BT)].reshape(1, BT)
        dx = qx - tx
        dy = qy - ty
        dz = qz - tz
        d2 = dx * dx + dy * dy + dz * dz  # inf coords of padding -> inf/nan
        d2 = jnp.where(jnp.isfinite(d2), d2, jnp.inf)
        tile_min = jnp.min(d2, axis=1)
        tile_arg = base + jnp.argmin(d2, axis=1).astype(jnp.int32)
        take = tile_min < best_d2
        return (jnp.where(take, tile_min, best_d2),
                jnp.where(take, tile_arg, best_idx))

    init = (jnp.full((BQ,), jnp.inf, jnp.float32), jnp.full((BQ,), -1, jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, n_tiles, body, init)
    o_d2_ref[:] = best_d2
    o_idx_ref[:] = best_idx


def _projected_kernel(q_ref, n_ref, t_ref, o_p2_ref, o_idx_ref, *, euclid_gate2, proj_gate2):
    n_tiles = t_ref.shape[1] // BT
    qx = q_ref[0, :].reshape(BQ, 1)
    qy = q_ref[1, :].reshape(BQ, 1)
    qz = q_ref[2, :].reshape(BQ, 1)
    nx = n_ref[0, :].reshape(BQ, 1)
    ny = n_ref[1, :].reshape(BQ, 1)
    nz = n_ref[2, :].reshape(BQ, 1)

    def body(i, carry):
        best_p2, best_idx = carry
        base = i * BT
        dx = t_ref[0, pl.ds(base, BT)].reshape(1, BT) - qx
        dy = t_ref[1, pl.ds(base, BT)].reshape(1, BT) - qy
        dz = t_ref[2, pl.ds(base, BT)].reshape(1, BT) - qz
        cx = dy * nz - dz * ny
        cy = dz * nx - dx * nz
        cz = dx * ny - dy * nx
        p2 = cx * cx + cy * cy + cz * cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 < euclid_gate2) & (p2 < proj_gate2)
        p2 = jnp.where(ok & jnp.isfinite(p2), p2, jnp.inf)
        tile_min = jnp.min(p2, axis=1)
        tile_arg = base + jnp.argmin(p2, axis=1).astype(jnp.int32)
        take = tile_min < best_p2
        return (jnp.where(take, tile_min, best_p2),
                jnp.where(take, tile_arg, best_idx))

    init = (jnp.full((BQ,), jnp.inf, jnp.float32), jnp.full((BQ,), -1, jnp.int32))
    best_p2, best_idx = jax.lax.fori_loop(0, n_tiles, body, init)
    o_p2_ref[:] = best_p2
    o_idx_ref[:] = best_idx


def _prep(query, target, target_valid):
    """Pad query to BQ multiple and target to BT multiple; invalid/padded
    target points become +inf coordinates (never win the argmin)."""
    q = query.shape[0]
    t = target.shape[0]
    qp = (-q) % BQ
    tp = (-t) % BT
    query_p = jnp.pad(query, ((0, qp), (0, 0)))
    target_p = jnp.where(target_valid[:, None], target, jnp.inf)
    target_p = jnp.pad(target_p, ((0, tp), (0, 0)), constant_values=jnp.inf)
    return query_p.T, target_p.T, q, t  # [3, Qp], [3, Tp]


@partial(jax.jit, static_argnames=("interpret",))
def nearest(query: jnp.ndarray, target: jnp.ndarray, target_valid: jnp.ndarray,
            radius: float | jnp.ndarray = jnp.inf,
            interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in Pallas replacement for ops.neighbors.nearest."""
    qT, tT, q, t = _prep(query, target, target_valid)
    n_q_blocks = qT.shape[1] // BQ

    d2, idx = pl.pallas_call(
        _nearest_kernel,
        grid=(n_q_blocks,),
        in_specs=[
            pl.BlockSpec((3, BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tT.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BQ,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q_blocks * BQ,), jnp.float32),
            jax.ShapeDtypeStruct((n_q_blocks * BQ,), jnp.int32),
        ],
        interpret=interpret,
    )(qT, tT)
    d2 = d2.reshape(-1)[:q]
    idx = idx.reshape(-1)[:q]
    valid = (idx >= 0) & (d2 <= jnp.asarray(radius, jnp.float32) ** 2)
    return d2, idx, valid


@partial(jax.jit, static_argnames=("euclid_gate", "proj_gate", "interpret"))
def projected_argmin(query: jnp.ndarray, query_normal: jnp.ndarray,
                     target: jnp.ndarray, target_valid: jnp.ndarray,
                     euclid_gate: float, proj_gate: float,
                     interpret: bool = False):
    """Drop-in Pallas replacement for ops.neighbors.projected_argmin.
    Returns (proj [Q], idx [Q], valid [Q])."""
    qT, tT, q, t = _prep(query, target, target_valid)
    nq = query_normal.shape[0]
    nT = jnp.pad(query_normal, ((0, (-nq) % BQ), (0, 0))).T
    n_q_blocks = qT.shape[1] // BQ

    kernel = partial(_projected_kernel,
                     euclid_gate2=float(euclid_gate) ** 2,
                     proj_gate2=float(proj_gate) ** 2)
    p2, idx = pl.pallas_call(
        kernel,
        grid=(n_q_blocks,),
        in_specs=[
            pl.BlockSpec((3, BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tT.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BQ,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q_blocks * BQ,), jnp.float32),
            jax.ShapeDtypeStruct((n_q_blocks * BQ,), jnp.int32),
        ],
        interpret=interpret,
    )(qT, nT, tT)
    p2 = p2.reshape(-1)[:q]
    idx = idx.reshape(-1)[:q]
    valid = (idx >= 0) & jnp.isfinite(p2)
    return jnp.sqrt(jnp.where(valid, p2, jnp.inf)), idx, valid


def _cylinder_kernel(live_ref, q_ref, n_ref, t_ref, o_cnt_ref, o_sum_ref, *,
                     rp2, r2):
    """Cylinder-gate neighbor statistics (majorAxisSampling inner loop,
    scan_registration.cpp:676-701): per query, count of target points with
    ||d|| < r_proj and ||d x n|| < r, plus the summed euclidean distance.
    Same streaming shape as _nearest_kernel: one pass over the target per
    query block, running (count, sum) accumulators in registers, no [Q, T]
    materialization. Math identical to ops.sampling.cylinder_stats (the XLA
    oracle): coordinate-difference d2 and the |d x n|^2 = d2 |n|^2 - (d.n)^2
    identity.

    live_ref (scalar prefetch, [1] i32) bounds the target's VALID PREFIX:
    the ring counting-sort (ops/preprocess.py) compacts every valid point
    below index sum(ring_count), so tiles past ceil(live/BT) are all
    padding (+inf coords, can never pass the d2 gate) and are skipped
    outright — at HDL-64 occupancy that is ~23% of the capacity-padded
    target. Callers that cannot prove a prefix pass live = capacity."""
    n_tiles_all = t_ref.shape[1] // BT
    n_tiles = jnp.minimum((live_ref[0] + BT - 1) // BT, n_tiles_all)
    qx = q_ref[0, :].reshape(BQ, 1)
    qy = q_ref[1, :].reshape(BQ, 1)
    qz = q_ref[2, :].reshape(BQ, 1)
    nx = n_ref[0, :].reshape(BQ, 1)
    ny = n_ref[1, :].reshape(BQ, 1)
    nz = n_ref[2, :].reshape(BQ, 1)
    n2 = nx * nx + ny * ny + nz * nz

    def body(i, carry):
        cnt, dsum = carry
        base = i * BT
        tx = t_ref[0, pl.ds(base, BT)].reshape(1, BT)
        ty = t_ref[1, pl.ds(base, BT)].reshape(1, BT)
        tz = t_ref[2, pl.ds(base, BT)].reshape(1, BT)
        dx = qx - tx
        dy = qy - ty
        dz = qz - tz
        d2 = dx * dx + dy * dy + dz * dz     # padding (+inf coords) -> inf
        dn = dx * nx + dy * ny + dz * nz
        p2 = d2 * n2 - dn * dn
        # d2=inf fails the first gate, so inf/nan p2 of padding never counts.
        ok = (d2 < rp2) & (p2 < r2)
        cnt = cnt + jnp.sum(jnp.where(ok, 1.0, 0.0), axis=1)
        dsum = dsum + jnp.sum(jnp.where(ok, jnp.sqrt(d2), 0.0), axis=1)
        return (cnt, dsum)

    init = (jnp.zeros((BQ,), jnp.float32), jnp.zeros((BQ,), jnp.float32))
    cnt, dsum = jax.lax.fori_loop(0, n_tiles, body, init)
    o_cnt_ref[:] = cnt
    o_sum_ref[:] = dsum


@partial(jax.jit, static_argnames=("r_proj", "r", "interpret"))
def cylinder_stats(query: jnp.ndarray, normal: jnp.ndarray,
                   target: jnp.ndarray, target_valid: jnp.ndarray,
                   r_proj: float, r: float, t_live=None,
                   interpret: bool = False):
    """Drop-in Pallas replacement for ops.sampling.cylinder_stats.
    Returns (count [Q] i32, dist_sum [Q] f32).

    t_live (optional traced i32): upper bound on the index of the last valid
    target row + 1. When the target layout is valid-prefix-compacted (the
    ring counting-sort guarantees this for filtered clouds), passing
    max(valid index)+1 lets the kernel skip whole all-padding tiles; None
    keeps the full-capacity loop (exactly the previous behavior)."""
    qT, tT, q, t = _prep(query, target, target_valid)
    nq = normal.shape[0]
    nT = jnp.pad(normal, ((0, (-nq) % BQ), (0, 0))).T
    n_q_blocks = qT.shape[1] // BQ
    live = (jnp.asarray(tT.shape[1], jnp.int32) if t_live is None
            else jnp.clip(jnp.asarray(t_live, jnp.int32), 0, tT.shape[1]))

    kernel = partial(_cylinder_kernel, rp2=float(r_proj) ** 2, r2=float(r) ** 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_q_blocks,),
        in_specs=[
            pl.BlockSpec((3, BQ), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BQ), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tT.shape[1]), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BQ,), lambda i, s: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ,), lambda i, s: (i,), memory_space=pltpu.VMEM),
        ],
    )
    cnt, dsum = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_q_blocks * BQ,), jnp.float32),
            jax.ShapeDtypeStruct((n_q_blocks * BQ,), jnp.float32),
        ],
        interpret=interpret,
    )(live.reshape(1), qT, nT, tT)
    return (cnt.reshape(-1)[:q].astype(jnp.int32), dsum.reshape(-1)[:q])


def _fps_kernel(steps_ref, x_ref, y_ref, z_ref, occ_ref, rank_ref, *,
                max_rank: int):
    """Batched per-bin farthest-first traversal, ALL bins x ALL steps inside
    ONE kernel invocation. The XLA while_loop form pays per-step dispatch
    (~25 us x up to `needed` steps = the 5.4 ms 'per-bin FPS' row of
    tools/profile_faithful_variants.py); here every step is a handful of VPU
    passes over the VMEM-resident [B, C] tables. Selection of the picked
    point's coordinates uses a one-hot masked sum (TPU has no cheap per-row
    lane gather); ties in argmax resolve to the lowest index, matching
    jnp.argmax in ops.sampling.fps_rank_within_bins (the oracle)."""
    occ = occ_ref[:, :] > 0.5                         # [B, C]
    x = x_ref[:, :]
    y = y_ref[:, :]
    z = z_ref[:, :]
    B, C = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    neg_inf = jnp.float32(-jnp.inf)

    def argmax_first(v):
        """Row argmax returning the LOWEST index among ties ([B, C] -> [B])."""
        m = jnp.max(v, axis=1, keepdims=True)
        hit = v >= m                                   # all-(-inf) rows: all hit
        return jnp.min(jnp.where(hit, col, C), axis=1)

    def d2_to(sel):                                    # sel: [B] slot ids
        one = col == sel[:, None]
        sx = jnp.sum(jnp.where(one, x, 0.0), axis=1, keepdims=True)
        sy = jnp.sum(jnp.where(one, y, 0.0), axis=1, keepdims=True)
        sz = jnp.sum(jnp.where(one, z, 0.0), axis=1, keepdims=True)
        dx = x - sx
        dy = y - sy
        dz = z - sz
        return dx * dx + dy * dy + dz * dz

    first = argmax_first(jnp.where(occ, 1.0, 0.0))
    any_occ = jnp.any(occ, axis=1)
    is_first = col == first[:, None]
    min_d = jnp.where(occ & ~is_first, d2_to(first), neg_inf)
    ranks = jnp.where(is_first & any_occ[:, None], 0, max_rank)

    steps = steps_ref[0]

    def body(i, carry):
        ranks, min_d = carry
        nxt = argmax_first(min_d)
        nxt_c = jnp.minimum(nxt, C - 1)
        has = jnp.max(min_d, axis=1) > neg_inf
        is_nxt = col == nxt_c[:, None]
        ranks = jnp.where(is_nxt & has[:, None], i, ranks)
        new_min = jnp.where(is_nxt, neg_inf,
                            jnp.minimum(min_d,
                                        jnp.where(occ, d2_to(nxt_c), neg_inf)))
        min_d = jnp.where(has[:, None], new_min, min_d)
        return ranks, min_d

    ranks, _ = jax.lax.fori_loop(1, steps, body, (ranks, min_d))
    rank_ref[:, :] = ranks


@partial(jax.jit, static_argnames=("max_rank", "interpret"))
def fps_ranks(table_xyz: jnp.ndarray, table_occ: jnp.ndarray, steps,
              max_rank: int, interpret: bool = False):
    """Pallas form of the batched-bin farthest-first rank table:
    table_xyz [B, C, 3], table_occ [B, C] (bool/float), steps (traced i32 =
    1 + number of rank-assignment iterations, i.e. ranks 0..steps-1 get
    assigned) -> ranks [B, C] i32 (max_rank where unassigned). Semantics ==
    the while_loop in ops.sampling.fps_rank_within_bins."""
    B, C, _ = table_xyz.shape
    steps_arr = jnp.asarray(steps, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = partial(_fps_kernel, max_rank=max_rank)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.int32),
        interpret=interpret,
    )(steps_arr,
      table_xyz[:, :, 0],
      table_xyz[:, :, 1],
      table_xyz[:, :, 2],
      table_occ.astype(jnp.float32))
