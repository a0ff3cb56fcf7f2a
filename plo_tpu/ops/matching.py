"""Stage 4 — matching: plane-ICP projection and IMLS surface projection.

The reference's erase-in-place rejection cascades (imls_icp.cpp:496-745,
laser_odometry.cpp:277-413) become masked batched kernels: every source point
is processed, a validity mask encodes survival, and per-reason counters are
exclusive first-failure attributions (matching the reference's delete_*
counters).

Parity notes (SURVEY.md §3.5):
  * Anchor search, euclidean mode: k=1 NN within radius r; IMLS additionally
    rejects min_dist > h^2 (imls_icp.cpp:597-625). plane_ICP has no h gate
    (laser_odometry.cpp:343-360).
  * Anchor search, projected mode: argmin ||(t-x) x n_x|| under gates — IMLS
    uses ||d|| < r_proj & proj < r (imls_icp.cpp:577), plane_ICP uses
    ||d|| < r^2 & proj < r_proj (laser_odometry.cpp:322) — the inconsistent
    radius roles are reproduced as-is.
  * IMLS bandwidth is adaptive: h_max = sqrt(nearDist2[n_accepted-1]) / 3,
    indexing the *sorted neighbor distance array* at position n_accepted-1
    (imls_icp.cpp:468) — not the distance of the last accepted neighbor; in
    projected mode those are squared projected distances. Reproduced exactly.
  * IMLS weights always use euclidean ||x-p||^2 (imls_icp.cpp:472-473).
  * height = projSum / (weightSum + 1e-5) (imls_icp.cpp:480).
  * When get_normals=false (and no tensor voting), the reference recomputes a
    PCA normal per touched target point via k=search_number_normal neighbors
    within r_normal (imls_icp.cpp:404-434, 647-669). Here those normals are
    precomputed once per frame for every target point
    (`precompute_target_normals`) — same values, computed once instead of per
    query.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from plo_tpu.cloud import PointCloud
from plo_tpu.config import IMLSConfig, PlaneICPConfig
from plo_tpu.ops import neighbors
from plo_tpu.ops.eigh3 import eigh3_descending


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MatchResult:
    """Correspondences y_i for surviving source points x_i (the reference's
    in_cloud / ref_cloud pair after the cascade)."""

    y: jnp.ndarray        # [S, 3] matched point on the target surface
    normal: jnp.ndarray   # [S, 3] target-surface normal at the match
    valid: jnp.ndarray    # [S] bool — survived the whole cascade
    counters: Dict[str, jnp.ndarray]  # per-reason exclusive rejection counts


def _angle_deg(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle between vector batches in degrees (imls_icp.cpp:444-445)."""
    cos = jnp.sum(a * b, axis=-1) / jnp.maximum(
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-12
    )
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


@partial(jax.jit, static_argnames=("k",))
def precompute_target_normals(xyz: jnp.ndarray, valid: jnp.ndarray,
                              r_normal: float, k: int):
    """ComputeNormal (imls_icp.cpp:753-794) for every target point: PCA of the
    k nearest neighbors within r_normal; invalid (normal=inf semantics) if
    fewer than k neighbors are found. Returns (normals [T, 3], ok [T])."""
    d2, idx, nvalid = neighbors.knn(xyz, xyz, valid, k=k, radius=r_normal)
    count = jnp.sum(nvalid, axis=1)
    pts = xyz[jnp.clip(idx, 0, xyz.shape[0] - 1)]           # [T, k, 3]
    w = nvalid[..., None].astype(jnp.float32)
    denom = jnp.maximum(count[:, None, None].astype(jnp.float32), 1.0)
    mu = jnp.sum(pts * w, axis=1, keepdims=True) / denom
    c = (pts - mu) * w
    cov = jnp.einsum("tki,tkj->tij", c, c) / denom
    _, vecs = eigh3_descending(cov)
    normal = vecs[:, :, 2]
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    ok = valid & (count >= k)
    return jnp.where(ok[:, None], normal, 0.0), ok


def _counters(eligible, stages):
    """Exclusive first-failure attribution: a point is counted against the
    first stage whose predicate it fails."""
    out = {}
    alive = eligible
    for name, passed in stages:
        failed_here = alive & ~passed
        out[name] = jnp.sum(failed_here.astype(jnp.int32))
        alive = alive & passed
    return out, alive


@partial(jax.jit, static_argnames=("use_projected", "angle_enabled"))
def _plane_icp_impl(src_xyz, src_normal, src_valid, tgt_xyz, tgt_normal, tgt_normal_ok,
                    tgt_valid, r: float, r_proj: float, angle_threshold: float,
                    use_projected: bool, angle_enabled: bool) -> MatchResult:
    cap = tgt_xyz.shape[0]
    if use_projected:
        # Quirk gates: ||d|| < r^2 and proj < r_proj (laser_odometry.cpp:322).
        _, idx, found = neighbors.projected_argmin(
            src_xyz, src_normal, tgt_xyz, tgt_valid, euclid_gate=r * r, proj_gate=r_proj
        )
    else:
        _, idx, found = neighbors.nearest(src_xyz, tgt_xyz, tgt_valid, radius=r)

    idx_c = jnp.clip(idx, 0, cap - 1)
    n = tgt_normal[idx_c]
    p = tgt_xyz[idx_c]
    normal_ok = found & neighbors.gather_mask(tgt_normal_ok, idx_c) & jnp.all(jnp.isfinite(n), axis=-1)
    if angle_enabled:
        angle_ok = _angle_deg(src_normal, n) <= angle_threshold
    else:
        angle_ok = jnp.ones_like(found)

    stages = [
        ("too_far", found),
        ("invalid_normal", normal_ok),
        ("normal_constraint", angle_ok),
    ]
    counters, alive = _counters(src_valid, stages)

    proj = jnp.sum((src_xyz - p) * n, axis=-1)
    y = src_xyz - proj[:, None] * n
    return MatchResult(
        y=jnp.where(alive[:, None], y, 0.0),
        normal=jnp.where(alive[:, None], n, 0.0),
        valid=alive,
        counters=counters,
    )


def plane_icp_project(source: PointCloud, target: PointCloud, cfg: PlaneICPConfig) -> MatchResult:
    """plane_ICP_proj (laser_odometry.cpp:277-413): y = x - ((x-p) . n) n."""
    return _plane_icp_impl(
        source.xyz, source.normal, source.valid,
        target.xyz, target.normal, target.valid, target.valid,
        cfg.r, cfg.use_projected_distance.r_proj,
        cfg.normal_angle_constraint.angle_diff_threshold,
        cfg.use_projected_distance.enabled,
        cfg.normal_angle_constraint.enabled,
    )


@partial(jax.jit, static_argnames=("k", "use_projected", "angle_enabled", "use_anchor_override",
                                   "knn_select"))
def _imls_impl(src_xyz, src_normal, src_valid, tgt_xyz, tgt_normal, tgt_normal_ok,
               tgt_valid, anchor_normal_src, anchor_ok_src,
               h: float, r: float, r_proj: float, angle_threshold: float,
               k: int, use_projected: bool, angle_enabled: bool,
               use_anchor_override: bool, knn_select: str = "approx") -> MatchResult:
    cap = tgt_xyz.shape[0]

    # ---- IMLS neighborhood first (ImplicitMLSFunction, imls_icp.cpp:301-483);
    # in euclidean mode the anchor (k=1 NN within the same radius r,
    # imls_icp.cpp:597-610) is exactly the first kNN result, so one pass over
    # the target serves both searches. ----
    if use_projected:
        pmin, aidx, found = neighbors.projected_argmin(
            src_xyz, src_normal, tgt_xyz, tgt_valid, euclid_gate=r_proj, proj_gate=r
        )
        min_dist = pmin * pmin  # squared projected distance (:587)
        npd, nidx, nfound = neighbors.projected_knn(
            src_xyz, src_normal, tgt_xyz, tgt_valid, k, euclid_gate=r_proj, proj_gate=r
        )
        near_d2 = npd * npd  # sorted squared projected distances
    else:
        near_d2, nidx, nfound = neighbors.knn(src_xyz, tgt_xyz, tgt_valid, k=k,
                                              radius=r, select=knn_select)
        min_dist, aidx, found = near_d2[:, 0], nidx[:, 0], nfound[:, 0]

    aidx_c = jnp.clip(aidx, 0, cap - 1)
    anchor_near = min_dist <= h * h  # :620-625
    if use_anchor_override:
        # Tensor-voting mode: the anchor normal is the SOURCE point's voted
        # normal (tensorVotingNormalsMap keyed by the source point,
        # imls_icp.cpp:634-644) — a reference quirk kept as-is.
        n_anchor = anchor_normal_src
        anchor_normal_ok = anchor_ok_src & jnp.all(jnp.isfinite(n_anchor), axis=-1)
    else:
        n_anchor = tgt_normal[aidx_c]
        anchor_normal_ok = neighbors.gather_mask(tgt_normal_ok, aidx_c) & jnp.all(jnp.isfinite(n_anchor), axis=-1)
    if angle_enabled:
        anchor_angle_ok = _angle_deg(src_normal, n_anchor) <= angle_threshold
    else:
        anchor_angle_ok = jnp.ones_like(found)

    nidx_c = jnp.clip(nidx, 0, cap - 1)
    npts = tgt_xyz[nidx_c]                         # [S, k, 3]
    nnrm = tgt_normal[nidx_c]                      # [S, k, 3]
    n_ok = nfound & neighbors.gather_mask(tgt_normal_ok, nidx_c)
    if angle_enabled:
        nang = _angle_deg(jnp.broadcast_to(src_normal[:, None, :], nnrm.shape), nnrm)
        n_ok = n_ok & (nang <= angle_threshold)

    n_accepted = jnp.sum(n_ok, axis=1)
    enough = n_accepted >= 3

    # Adaptive bandwidth: nearDist2[n_accepted - 1] of the sorted distance
    # array (imls_icp.cpp:468) — reference quirk, reproduced verbatim.
    pick = jnp.clip(n_accepted - 1, 0, k - 1)
    d_far2 = jnp.take_along_axis(near_d2, pick[:, None], axis=1)[:, 0]
    h_max = jnp.sqrt(jnp.maximum(d_far2, 0.0)) / 3.0
    h_max2 = jnp.maximum(h_max * h_max, 1e-20)

    diff = src_xyz[:, None, :] - npts              # x - p_i
    d2_euclid = jnp.sum(diff * diff, axis=-1)
    w = jnp.where(n_ok, jnp.exp(-d2_euclid / h_max2[:, None]), 0.0)
    proj = jnp.sum(diff * nnrm, axis=-1)
    weight_sum = jnp.sum(w, axis=1)
    proj_sum = jnp.sum(w * proj, axis=1)
    height = proj_sum / (weight_sum + 1e-5)
    height_ok = jnp.isfinite(height)

    stages = [
        ("too_far", found & anchor_near),
        ("invalid_normal", anchor_normal_ok),
        ("normal_constraint", anchor_angle_ok),
        ("mls_fail", enough),
        ("nan_inf_height", height_ok),
    ]
    counters, alive = _counters(src_valid, stages)

    y = src_xyz - height[:, None] * n_anchor
    return MatchResult(
        y=jnp.where(alive[:, None], y, 0.0),
        normal=jnp.where(alive[:, None], n_anchor, 0.0),
        valid=alive,
        counters=counters,
    )


@partial(jax.jit, static_argnames=("k", "knn_select"))
def _imls_search_impl(src_xyz, tgt_xyz, tgt_valid, r: float, k: int,
                      knn_select: str):
    _, nidx, nfound = neighbors.knn(src_xyz, tgt_xyz, tgt_valid, k=k,
                                    radius=r, select=knn_select)
    return nidx, nfound


def imls_search(source: PointCloud, target: PointCloud, cfg: IMLSConfig,
                knn_select: str = "approx"):
    """Neighbor-candidate search only (euclidean mode): the k nearest target
    points within radius r per source point. Feed the result to
    `imls_project_cached` to re-evaluate the IMLS projection at updated source
    poses without re-searching the whole target (correspondence freezing —
    an optimization mode, laser_odometry config `refresh_correspondences`)."""
    assert not cfg.use_projected_distance.enabled, "freeze mode is euclidean-only"
    return _imls_search_impl(source.xyz, target.xyz, target.valid,
                             cfg.r, cfg.search_number, knn_select)


def imls_search_grid(source: PointCloud, target: PointCloud, cfg: IMLSConfig,
                     grid_cell: float, grid_m: int, grid_buckets: int):
    """Freeze-mode candidate search via the grid-hash engine (ops/grid_hash.py)
    — the sub-linear path for voxel-map targets: O(27 m) gathered candidates
    per query instead of an O(T) scan.

    Contract: exact for neighbors within min(r, grid_cell) when per-cell
    occupancy <= grid_m (guaranteed by construction on a voxel-downsampled map
    with grid_cell/voxel_size <= cbrt(grid_m)); neighbors between grid_cell
    and r can be missed — on a 0.3 m voxel map the 20 nearest live well inside
    a 1.5 m cell, and tests assert equality with the dense engine."""
    from plo_tpu.ops import grid_hash

    assert not cfg.use_projected_distance.enabled, "freeze mode is euclidean-only"
    cell = min(cfg.r, grid_cell)
    gh = grid_hash.build(target.xyz, target.valid, cell, grid_buckets)
    d2, idx, ok = grid_hash.knn(gh, source.xyz, cfg.search_number, cfg.r, m=grid_m)
    return idx, ok


def _imls_eval_gathered(src_xyz, src_normal, src_valid, npts, nnrm,
                        neighbor_normal_ok, cand_present, h: float, r: float,
                        angle_threshold: float, k: int,
                        angle_enabled: bool) -> MatchResult:
    """IMLS projection over already-gathered candidate arrays ([S, k, 3]
    points/normals + masks): distances, the anchor (argmin within the set),
    the radius/h gates, the adaptive bandwidth, and the height are all
    recomputed from the CURRENT source positions/normals; only the candidate
    identities are frozen. This is the core shared by the index-cached
    single-device path and the sharded-map path (where the distributed search
    returns the candidates themselves and the global map is never gathered)."""
    diff = src_xyz[:, None, :] - npts
    d2_euclid = jnp.sum(diff * diff, axis=-1)
    present = cand_present & (d2_euclid <= r * r)    # radius re-gate
    d2_masked = jnp.where(present, d2_euclid, jnp.inf)

    # Anchor = nearest present candidate (k=1 NN within r, imls_icp.cpp:597-610).
    j_star = jnp.argmin(d2_masked, axis=1)
    min_dist = jnp.take_along_axis(d2_masked, j_star[:, None], axis=1)[:, 0]
    found = jnp.any(present, axis=1)
    min_dist = jnp.where(found, min_dist, 0.0)
    anchor_near = min_dist <= h * h                  # :620-625
    n_anchor = jnp.take_along_axis(nnrm, j_star[:, None, None], axis=1)[:, 0]
    anchor_normal_ok = jnp.take_along_axis(
        neighbor_normal_ok, j_star[:, None], axis=1)[:, 0] & jnp.all(
        jnp.isfinite(n_anchor), axis=-1)
    if angle_enabled:
        anchor_angle_ok = _angle_deg(src_normal, n_anchor) <= angle_threshold
    else:
        anchor_angle_ok = jnp.ones_like(found)

    n_ok = present & neighbor_normal_ok
    if angle_enabled:
        nang = _angle_deg(jnp.broadcast_to(src_normal[:, None, :], nnrm.shape), nnrm)
        n_ok = n_ok & (nang <= angle_threshold)
    n_accepted = jnp.sum(n_ok, axis=1)
    enough = n_accepted >= 3

    # Adaptive bandwidth from the sorted in-radius distances (imls_icp.cpp:468).
    near_d2 = jnp.sort(d2_masked, axis=1)
    pick = jnp.clip(n_accepted - 1, 0, k - 1)
    d_far2 = jnp.take_along_axis(near_d2, pick[:, None], axis=1)[:, 0]
    d_far2 = jnp.where(jnp.isfinite(d_far2), d_far2, 0.0)
    h_max = jnp.sqrt(jnp.maximum(d_far2, 0.0)) / 3.0
    h_max2 = jnp.maximum(h_max * h_max, 1e-20)

    w = jnp.where(n_ok, jnp.exp(-d2_euclid / h_max2[:, None]), 0.0)
    proj = jnp.sum(diff * nnrm, axis=-1)
    weight_sum = jnp.sum(w, axis=1)
    proj_sum = jnp.sum(w * proj, axis=1)
    height = proj_sum / (weight_sum + 1e-5)
    height_ok = jnp.isfinite(height)

    stages = [
        ("too_far", found & anchor_near),
        ("invalid_normal", anchor_normal_ok),
        ("normal_constraint", anchor_angle_ok),
        ("mls_fail", enough),
        ("nan_inf_height", height_ok),
    ]
    counters, alive = _counters(src_valid, stages)

    y = src_xyz - height[:, None] * n_anchor
    return MatchResult(
        y=jnp.where(alive[:, None], y, 0.0),
        normal=jnp.where(alive[:, None], n_anchor, 0.0),
        valid=alive,
        counters=counters,
    )


@partial(jax.jit, static_argnames=("k", "angle_enabled"))
def _imls_eval_cached(src_xyz, src_normal, src_valid, tgt_xyz, tgt_normal,
                      tgt_normal_ok, nidx, nfound, h: float, r: float,
                      angle_threshold: float, k: int,
                      angle_enabled: bool) -> MatchResult:
    """Index-cached variant of `_imls_eval_gathered`: gathers the candidate
    rows from the target cloud, then evaluates. At the search pose this
    reproduces `_imls_impl` (euclidean mode) exactly; after sub-cm pose
    updates it differs only by points entering/leaving the radius, which the
    re-applied gates handle conservatively."""
    cap = tgt_xyz.shape[0]
    nidx_c = jnp.clip(nidx, 0, cap - 1)
    npts = tgt_xyz[nidx_c]                           # [S, k, 3]
    nnrm = tgt_normal[nidx_c]                        # [S, k, 3]
    n_ok = neighbors.gather_mask(tgt_normal_ok, nidx_c)
    return _imls_eval_gathered(src_xyz, src_normal, src_valid, npts, nnrm,
                               n_ok, nfound, h, r, angle_threshold, k,
                               angle_enabled)


def imls_project_candidates(source: PointCloud, cand_xyz, cand_normal,
                            cand_normal_ok, cand_present,
                            cfg: IMLSConfig) -> MatchResult:
    """ProjSourcePtToSurface evaluated against gathered candidate arrays
    ([S, k, 3] + masks) — the sharded-map path: the distributed search returns
    the candidates themselves, so this evaluation never touches the global
    map (see parallel/map_store.py::ShardedMapStore.knn_gather)."""
    assert not cfg.use_projected_distance.enabled, "candidates mode is euclidean-only"
    return _imls_eval_gathered(
        source.xyz, source.normal, source.valid,
        cand_xyz, cand_normal, cand_normal_ok, cand_present,
        cfg.h, cfg.r, cfg.normal_angle_constraint.angle_diff_threshold,
        cfg.search_number, cfg.normal_angle_constraint.enabled)


def imls_project_cached(source: PointCloud, target: PointCloud, cfg: IMLSConfig,
                        cache, target_normal=None, target_normal_ok=None) -> MatchResult:
    """ProjSourcePtToSurface evaluated against a frozen candidate set from
    `imls_search` (see `_imls_eval_cached`)."""
    tn = target.normal if target_normal is None else target_normal
    tok = target.valid if target_normal_ok is None else (target.valid & target_normal_ok)
    nidx, nfound = cache
    return _imls_eval_cached(
        source.xyz, source.normal, source.valid,
        target.xyz, tn, tok, nidx, nfound,
        cfg.h, cfg.r, cfg.normal_angle_constraint.angle_diff_threshold,
        cfg.search_number, cfg.normal_angle_constraint.enabled,
    )


def imls_project(source: PointCloud, target: PointCloud, cfg: IMLSConfig,
                 target_normal=None, target_normal_ok=None,
                 anchor_normal_src=None, anchor_ok_src=None,
                 knn_select: str = "approx") -> MatchResult:
    """ProjSourcePtToSurface (imls_icp.cpp:496-745): y = x - I(x) n.

    `target_normal`/`target_normal_ok` override the target cloud's stored
    normals (used for the get_normals=false precomputed path);
    `anchor_normal_src`/`anchor_ok_src` supply per-SOURCE anchor normals (the
    tensor-voting path)."""
    tn = target.normal if target_normal is None else target_normal
    tok = target.valid if target_normal_ok is None else (target.valid & target_normal_ok)
    use_override = anchor_normal_src is not None
    if not use_override:
        anchor_normal_src = source.normal
        anchor_ok_src = source.valid
    return _imls_impl(
        source.xyz, source.normal, source.valid,
        target.xyz, tn, tok, target.valid,
        anchor_normal_src, anchor_ok_src,
        cfg.h, cfg.r, cfg.use_projected_distance.r_proj,
        cfg.normal_angle_constraint.angle_diff_threshold,
        cfg.search_number,
        cfg.use_projected_distance.enabled,
        cfg.normal_angle_constraint.enabled,
        use_override,
        knn_select,
    )
