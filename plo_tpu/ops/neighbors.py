"""Neighbor-search engine: the TPU replacement for kd-trees (FLANN, libnabo).

The reference's matching stack does three kinds of searches against the target
cloud (imls_icp.cpp):
  1. k=1 NN within radius (anchor search, imls_icp.cpp:597-610),
  2. kNN within radius (IMLS neighborhood k=20, :372-376; normal est k=10,
     :414-416),
  3. masked *projected-distance* argmin / top-k (`use_projected_distance`
     paths, :341-364, :563-595) — already a dense O(Q*T) scan in C++.

On TPU all three are expressed as tiled distance computations: the cross term
of ||q - t||^2 is a [Q,3]x[3,C] matmul per target chunk (MXU work), the rest is
VPU elementwise + running top-k merge in a `lax.scan` carry. Results are exact
(identical neighbor sets to a kd-tree, incl. SORT_RESULTS/ALLOW_SELF_MATCH
semantics), with fixed-k padding + validity masks instead of variable counts.

A grid-hash variant (sub-linear per query) is the planned Pallas fast path;
this module is the exact reference-semantics engine every other op builds on.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INF = jnp.inf


def gather_mask(mask: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather a boolean mask at arbitrary indices via a f32 gather.

    Direct bool gathers lower to a catastrophically slow custom kernel on TPU
    (measured 17 ms for [65536, 33] vs 0.05 ms for the same gather in f32 —
    see the fusion.22/24 trace notes in SKILL.md); routing through f32 keeps
    the op on the fast gather path.
    """
    return mask.astype(jnp.float32)[idx] > 0.5


def _chunk_count(t: int, chunk: int) -> int:
    return -(-t // chunk)


# Max elements of the [Q, chunk] distance working set. XLA fuses the
# coordinate-difference distance into the selection op, so fewer chunks =
# fewer scan iterations = faster (measured 6x from 8 chunks -> 1 at
# 2048x65536); the cap only guards the unfused worst case.
_AUTO_CHUNK_ELEMS = 2048 * 65536


def _auto_chunk(q: int, t: int, chunk) -> int:
    if chunk is not None:
        return chunk
    return max(4096, min(t, _AUTO_CHUNK_ELEMS // max(q, 1)))


def _pairwise_d2(query: jnp.ndarray, tc: jnp.ndarray) -> jnp.ndarray:
    """Squared distances [Q, C] via per-coordinate differences.

    Deliberately NOT the |q|^2+|t|^2-2qt matmul form: at 100+ m ranges that
    form cancels to ~1e-3 absolute error in f32, enough to permute near-tie
    neighbors. Coordinate differences keep error at the point-spacing scale.
    """
    d2 = jnp.zeros((query.shape[0], tc.shape[0]), jnp.float32)
    for c in range(3):
        diff = query[:, c : c + 1] - tc[None, :, c]
        d2 = d2 + diff * diff
    return d2


def _pad_targets(target: jnp.ndarray, tvalid: jnp.ndarray, chunk: int):
    t = target.shape[0]
    n_chunks = _chunk_count(t, chunk)
    pad = n_chunks * chunk - t
    target = jnp.pad(target, ((0, pad), (0, 0)))
    tvalid = jnp.pad(tvalid, (0, pad))
    return target.reshape(n_chunks, chunk, 3), tvalid.reshape(n_chunks, chunk), n_chunks


@partial(jax.jit, static_argnames=("k", "chunk", "select"))
def knn(
    query: jnp.ndarray,          # [Q, 3]
    target: jnp.ndarray,         # [T, 3]
    target_valid: jnp.ndarray,   # [T] bool
    k: int,
    radius: float | jnp.ndarray = jnp.inf,
    chunk: Optional[int] = None,
    select: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k-nearest-neighbors by squared Euclidean distance.

    Returns (d2 [Q, k] ascending, idx [Q, k], neighbor_valid [Q, k]).
    Matches libnabo knn with SORT_RESULTS | ALLOW_SELF_MATCH and max radius
    (imls_icp.cpp:372-376): neighbors beyond `radius` are invalid (d2=inf).

    select="exact" uses lax.top_k per chunk. select="approx" uses the TPU's
    approx_min_k selection network per chunk (measured ~7x faster at recall
    1.0000 on LiDAR-scale data; the cross-chunk merge stays exact) — the
    fast path for production configs, parity remains statistical
    (SURVEY.md §7.3 RNG note). On CPU backends approx_min_k lowers to a full
    sort (measured 6.1 s vs 0.055 s for top_k at [1500, 16k]), so "approx"
    silently degrades to the exact top_k there — same results, right speed.
    """
    if select == "approx" and jax.default_backend() == "cpu":
        select = "exact"
    q = query.shape[0]
    chunk = _auto_chunk(q, target.shape[0], chunk)
    tchunks, vchunks, n_chunks = _pad_targets(target, target_valid, chunk)

    init = (
        jnp.full((q, k), INF, jnp.float32),
        jnp.full((q, k), -1, jnp.int32),
    )

    def body(carry, inputs):
        best_d2, best_idx = carry
        tc, vc, base = inputs
        d2 = jnp.where(vc[None, :], _pairwise_d2(query, tc), INF)
        if select == "approx":
            cd2, cpos = jax.lax.approx_min_k(d2, k)
            cidx = base + cpos.astype(jnp.int32)
            cat_d2 = jnp.concatenate([best_d2, cd2], axis=1)
            cat_idx = jnp.concatenate([best_idx, cidx], axis=1)
        else:
            idx = base + jnp.arange(tc.shape[0], dtype=jnp.int32)[None, :]
            cat_d2 = jnp.concatenate([best_d2, d2], axis=1)
            cat_idx = jnp.concatenate([best_idx, jnp.broadcast_to(idx, d2.shape)], axis=1)
        neg_top, pos = jax.lax.top_k(-cat_d2, k)
        return (-neg_top, jnp.take_along_axis(cat_idx, pos, axis=1)), None

    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (best_d2, best_idx), _ = jax.lax.scan(body, init, (tchunks, vchunks, bases))
    valid = (best_idx >= 0) & (best_d2 <= jnp.asarray(radius, jnp.float32) ** 2) & jnp.isfinite(best_d2)
    return best_d2, best_idx, valid


def nearest(
    query: jnp.ndarray,
    target: jnp.ndarray,
    target_valid: jnp.ndarray,
    radius: float | jnp.ndarray = jnp.inf,
    chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k=1 NN (anchor search, imls_icp.cpp:597-610). Returns (d2, idx, valid),
    each [Q].

    On TPU backends this dispatches to the Pallas streaming kernel
    (ops/pallas_nn.py — one pass over the target per query block, no [Q, T]
    materialization; same results, ~15% faster); the chunked XLA scan below
    is the portable path and the oracle the Pallas kernel is tested against."""
    if jax.default_backend() == "tpu" and chunk is None:
        from plo_tpu.ops import pallas_nn
        return pallas_nn.nearest(query, target, target_valid, radius)
    return _nearest_xla(query, target, target_valid, radius, chunk)


@partial(jax.jit, static_argnames=("chunk",))
def _nearest_xla(
    query: jnp.ndarray,
    target: jnp.ndarray,
    target_valid: jnp.ndarray,
    radius: float | jnp.ndarray = jnp.inf,
    chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    q = query.shape[0]
    chunk = _auto_chunk(q, target.shape[0], chunk)
    tchunks, vchunks, n_chunks = _pad_targets(target, target_valid, chunk)

    def body(carry, inputs):
        best_d2, best_idx = carry
        tc, vc, base = inputs
        d2 = jnp.where(vc[None, :], _pairwise_d2(query, tc), INF)
        cmin = jnp.min(d2, axis=1)
        cidx = base + jnp.argmin(d2, axis=1).astype(jnp.int32)
        take = cmin < best_d2
        return (jnp.where(take, cmin, best_d2), jnp.where(take, cidx, best_idx)), None

    init = (jnp.full((q,), INF, jnp.float32), jnp.full((q,), -1, jnp.int32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_d2, best_idx), _ = jax.lax.scan(body, init, (tchunks, vchunks, bases))
    valid = (best_idx >= 0) & (best_d2 <= jnp.asarray(radius, jnp.float32) ** 2)
    return best_d2, best_idx, valid


@partial(jax.jit, static_argnames=("k", "chunk"))
def projected_knn(
    query: jnp.ndarray,         # [Q, 3]
    query_normal: jnp.ndarray,  # [Q, 3]
    target: jnp.ndarray,        # [T, 3]
    target_valid: jnp.ndarray,  # [T]
    k: int,
    euclid_gate: float,         # max ||t - q||
    proj_gate: float,           # max ||(t - q) x n||
    chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k smallest projected distances ||(t - q) x n_q|| subject to
    ||t - q|| < euclid_gate and proj < proj_gate.

    Replicates the reference's `use_projected_distance` candidate scan
    (imls_icp.cpp:341-364 with gates ||d||<r_proj & proj<r; the plane_ICP
    variant at laser_odometry.cpp:316-334 uses gates ||d||<r^2 & proj<r_proj —
    pass the thresholds accordingly).

    Returns (proj [Q, k] ascending — NOT squared, matching the reference's
    sort key — idx [Q, k], valid [Q, k]).
    """
    q = query.shape[0]
    chunk = _auto_chunk(q, target.shape[0], chunk)
    tchunks, vchunks, n_chunks = _pad_targets(target, target_valid, chunk)

    nx, ny, nz = query_normal[:, 0:1], query_normal[:, 1:2], query_normal[:, 2:3]

    def body(carry, inputs):
        best_p2, best_idx = carry
        tc, vc, base = inputs
        # Coordinate-wise [Q, C] working set (never materializes [Q, C, 3]).
        dx = tc[None, :, 0] - query[:, 0:1]
        dy = tc[None, :, 1] - query[:, 1:2]
        dz = tc[None, :, 2] - query[:, 2:3]
        cx = dy * nz - dz * ny
        cy = dz * nx - dx * nz
        cz = dx * ny - dy * nx
        proj2 = cx * cx + cy * cy + cz * cz
        dist2 = dx * dx + dy * dy + dz * dz
        ok = vc[None, :] & (dist2 < euclid_gate**2) & (proj2 < proj_gate**2)
        proj2 = jnp.where(ok, proj2, INF)
        idx = base + jnp.arange(tc.shape[0], dtype=jnp.int32)[None, :]

        cat_p = jnp.concatenate([best_p2, proj2], axis=1)
        cat_idx = jnp.concatenate([best_idx, jnp.broadcast_to(idx, proj2.shape)], axis=1)
        neg_top, pos = jax.lax.top_k(-cat_p, k)
        return (-neg_top, jnp.take_along_axis(cat_idx, pos, axis=1)), None

    init = (jnp.full((q, k), INF, jnp.float32), jnp.full((q, k), -1, jnp.int32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_p2, best_idx), _ = jax.lax.scan(body, init, (tchunks, vchunks, bases))
    valid = (best_idx >= 0) & jnp.isfinite(best_p2)
    return jnp.sqrt(jnp.where(jnp.isfinite(best_p2), best_p2, INF)), best_idx, valid


def projected_argmin(query, query_normal, target, target_valid, euclid_gate, proj_gate, chunk: Optional[int] = None):
    """k=1 projected-distance anchor search (imls_icp.cpp:563-595).

    Returns (proj [Q], idx [Q], valid [Q]). On TPU backends with static gates
    this dispatches to the Pallas streaming kernel (ops/pallas_nn.py,
    measured ~25% faster than the XLA scan at 2048x131k)."""
    if (jax.default_backend() == "tpu" and chunk is None
            and isinstance(euclid_gate, (int, float))
            and isinstance(proj_gate, (int, float))):
        from plo_tpu.ops import pallas_nn
        return pallas_nn.projected_argmin(
            query, query_normal, target, target_valid,
            float(euclid_gate), float(proj_gate))
    p, idx, valid = projected_knn(
        query, query_normal, target, target_valid, 1, euclid_gate, proj_gate, chunk=chunk
    )
    return p[:, 0], idx[:, 0], valid[:, 0]


@partial(jax.jit, static_argnames=("window",))
def ring_neighbor_search(
    query_xyz: jnp.ndarray,      # [P, 3] ring-sorted cloud
    query_ring: jnp.ndarray,     # [P] i32
    query_pos: jnp.ndarray,      # [P] i32 position within own ring
    query_valid: jnp.ndarray,    # [P]
    ring_start: jnp.ndarray,     # [H]
    ring_count: jnp.ndarray,     # [H]
    ring_offset: int,            # +1 / -1: which adjacent ring to search
    window: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest 3D point on an adjacent ring via an azimuth-windowed gather.

    Replaces the per-ring kd-trees of findNearestPoint
    (scan_registration.cpp:117-136, :1149-1159): rings are azimuth-ordered, so
    the 3D nearest neighbor on ring r+-1 is found among the ~`window` points
    around the query's fractional position in that ring. Returns
    (d2 [P], flat index [P], found [P]).
    """
    h = ring_start.shape[0]
    tring = query_ring + ring_offset
    tring_ok = (tring >= 0) & (tring < h)
    tring_c = jnp.clip(tring, 0, h - 1)
    tstart = ring_start[tring_c]
    tcount = ring_count[tring_c]
    qcount = jnp.maximum(ring_count[jnp.clip(query_ring, 0, h - 1)], 1)

    # Fractional position carried over to the adjacent ring.
    center = (query_pos.astype(jnp.float32) / qcount.astype(jnp.float32)) * tcount.astype(jnp.float32)
    center = center.astype(jnp.int32)

    offs = jnp.arange(-window, window + 1, dtype=jnp.int32)  # [2w+1]
    cand_pos = center[:, None] + offs[None, :]
    in_ring = (cand_pos >= 0) & (cand_pos < tcount[:, None]) & tring_ok[:, None]
    cand_flat = jnp.clip(tstart[:, None] + cand_pos, 0, query_xyz.shape[0] - 1)
    # One packed row gather [P, 2w+1, 4] instead of separate xyz + mask
    # gathers: scalar gathers from 1-D arrays are a slow TPU path.
    packed = jnp.concatenate([query_xyz, query_valid.astype(jnp.float32)[:, None]], axis=1)
    cand = packed[cand_flat]  # [P, 2w+1, 4]
    cand_xyz = cand[..., :3]
    cand_valid = in_ring & (cand[..., 3] > 0.5)

    diff = cand_xyz - query_xyz[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_valid, d2, INF)
    best = jnp.argmin(d2, axis=1)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    best_flat = jnp.take_along_axis(cand_flat, best[:, None], axis=1)[:, 0]
    found = jnp.isfinite(best_d2) & query_valid
    return best_d2, best_flat, found
