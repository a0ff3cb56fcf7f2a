"""Stage 2 — normal estimation: PCA, cross-product (ring layout) and
FALS / SRI (range-image layout).

Reference parity map:
  * PCA: per-point gather of a +-window along the own ring plus windows around
    the nearest point on rings above/below, 3x3 covariance eigendecomposition,
    plane-validity check, +z hemisphere flip
    (scan_registration.cpp:117-229, loop :1161-1229).
  * cross_product: n = (forward - backward) x (up - down) with ring+-1 nearest
    points (:231-277, loop :1248-1290).
  * FALS: b = sum_window v/r over occupied cells, n = M^-1 b with M summed over
    ALL in-bounds window cells (occupancy ignored — reference quirk,
    range_image.cpp:40-84,117-180).
  * SRI: Prewitt gradients of the range image in spherical coords,
    n = Rhat [1, dr/dtheta/(r cos phi), dr/dphi/r] (range_image.cpp:86-115,
    182-261).

All paths flip normals into the +z hemisphere (scan_registration.cpp:1196-1200
etc.) — a behavior the solve depends on (SURVEY.md §3.5).

Deviation note: the reference's FALS/SRI paths index the ring-major cloud with
range-image cell counters (scan_registration.cpp:1305-1327), a bookkeeping bug
(both methods are marked broken in results.png). Here the range-image paths are
implemented as intended: each occupied cell carries its own xyz.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plo_tpu.cloud import PointCloud
from plo_tpu.config import PCAConfig, CrossProductConfig
from plo_tpu.ops.eigh3 import eigh3_descending
from plo_tpu.ops.neighbors import gather_mask, ring_neighbor_search
from plo_tpu.ops.preprocess import RingCloud


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NormalResult:
    """Filtered cloud + PCA side data (the reference's filteredLaserCloud,
    eigenvalues_matrix, eigenvectors_matrix and invalid_indices,
    scan_registration.cpp:1122-1134)."""

    cloud: PointCloud          # valid = point survived normal computation
    eigvecs: jnp.ndarray       # [P, 3, 3] descending-order eigenvector columns
    plane_fail: jnp.ndarray    # [P] bool — kept in cloud (use_all_points) but
                               # excluded from sampling candidates (:1481-1489)


def _adjacent_ring_index(cloud: RingCloud, offset: int, mode: str,
                         knn_threshold: float, window: int = 8):
    """Flat index of the reference's findNearestPoint on ring r+offset
    (scan_registration.cpp:117-136). mode='kdtree': 3D NN with squared-distance
    threshold (FLANN returns squared distances). mode='index': same position
    index within the adjacent ring."""
    h = cloud.ring_start.shape[0]
    if mode == "kdtree":
        d2, flat, found = ring_neighbor_search(
            cloud.xyz, cloud.ring, cloud.pos_in_ring, cloud.valid,
            cloud.ring_start, cloud.ring_count, offset, window=window,
        )
        found = found & (d2 < knn_threshold)
        return flat, found
    elif mode == "index":
        tring = cloud.ring + offset
        ok = (tring >= 0) & (tring < h)
        tring_c = jnp.clip(tring, 0, h - 1)
        flat = cloud.ring_start[tring_c] + cloud.pos_in_ring
        ok = ok & (cloud.pos_in_ring < cloud.ring_count[tring_c])
        return jnp.clip(flat, 0, cloud.capacity - 1), ok & cloud.valid
    raise ValueError(f"invalid neighbor_scan {mode!r}")


def _ring_interior_mask(cloud: RingCloud) -> jnp.ndarray:
    """Points eligible for normal computation: ring in [1, H-2], own/adjacent
    ring sizes >= 17, and position in [5, size-5) (scan_registration.cpp:
    1162-1170 — scanEnd-scanStart < 6 with the +5/-6 index offsets means rings
    shorter than 17 points are skipped entirely)."""
    h = cloud.ring_start.shape[0]
    ring = jnp.clip(cloud.ring, 0, h - 1)
    size_ok = lambda r: cloud.ring_count[jnp.clip(r, 0, h - 1)] >= 17
    ring_ok = (cloud.ring >= 1) & (cloud.ring <= h - 2)
    sizes_ok = size_ok(ring) & size_ok(ring - 1) & size_ok(ring + 1)
    pos_ok = (cloud.pos_in_ring >= 5) & (cloud.pos_in_ring < cloud.ring_count[ring] - 5)
    return cloud.valid & ring_ok & sizes_ok & pos_ok


def _packed_points(cloud: RingCloud) -> jnp.ndarray:
    """[P, 5] = [x, y, z, ring, valid] — one row-gatherable array so window
    lookups are a single contiguous-row gather (scalar gathers from 1-D
    arrays are a slow TPU path; see ops.neighbors.gather_mask)."""
    return jnp.concatenate(
        [cloud.xyz, cloud.ring.astype(jnp.float32)[:, None],
         cloud.valid.astype(jnp.float32)[:, None]], axis=1)


def _window_gather(cloud: RingCloud, packed: jnp.ndarray, center_flat: jnp.ndarray,
                   center_ok: jnp.ndarray, window_size: int, iter_step: int):
    """Gather the +-window along the ring of `center_flat`; a slot is valid if
    it stays inside the same ring (scan_registration.cpp:166-169)."""
    offs = jnp.arange(-window_size, window_size + 1, iter_step, dtype=jnp.int32)
    idx = center_flat[:, None] + offs[None, :]
    idx_c = jnp.clip(idx, 0, cloud.capacity - 1)
    rows = packed[idx_c]                       # [P, Wn, 5] one row gather
    center_ring = packed[jnp.clip(center_flat, 0, cloud.capacity - 1), 3]
    same_ring = rows[..., 3] == center_ring[:, None]
    in_bounds = (idx >= 0) & (idx < cloud.capacity)
    ok = center_ok[:, None] & same_ring & in_bounds & (rows[..., 4] > 0.5)
    return rows[..., :3], ok  # [P, Wn, 3], [P, Wn]


def _window_shift(cloud: RingCloud, packed: jnp.ndarray,
                  center_ok: jnp.ndarray, window_size: int, iter_step: int):
    """Self-window variant of _window_gather: the centers are the points
    themselves, so window slots are CONSECUTIVE flat indices and each offset
    is a shifted copy of the packed array (contiguous vector copies) instead
    of a random-access row gather — TPU gathers are the slow path."""
    p = cloud.capacity
    offs = list(range(-window_size, window_size + 1, iter_step))
    idx = jnp.arange(p, dtype=jnp.int32)[:, None] + jnp.asarray(offs, jnp.int32)[None, :]
    rows = jnp.stack([jnp.roll(packed, -o, axis=0) for o in offs], axis=1)
    same_ring = rows[..., 3] == packed[:, None, 3]
    in_bounds = (idx >= 0) & (idx < p)  # roll wraps; mask the wrapped slots
    ok = center_ok[:, None] & same_ring & in_bounds & (rows[..., 4] > 0.5)
    return rows[..., :3], ok


def _fused_adjacent_window(cloud: RingCloud, packed: jnp.ndarray, offset: int,
                           knn_threshold: float, window_size: int,
                           iter_step: int, eligible: jnp.ndarray,
                           search_window: int = 8):
    """Fused findNearestPoint + window gather on ring r+offset: ONE
    [P, 2*(search_window+window_size)+1, 5] row gather covers both the kd
    emulation's +-search_window candidate arc (ops.neighbors.
    ring_neighbor_search semantics, same candidate set / argmin / threshold)
    and the +-window_size PCA window around whichever candidate wins — the
    window rows are then take_along_axis slot selections from the already-
    gathered arc instead of a second HBM gather (TPU gathers are the cost
    here; this halves the gather traffic of the kdtree PCA mode)."""
    h = cloud.ring_start.shape[0]
    tring = cloud.ring + offset
    tring_ok = (tring >= 0) & (tring < h)
    tring_c = jnp.clip(tring, 0, h - 1)
    tstart = cloud.ring_start[tring_c]
    tcount = cloud.ring_count[tring_c]
    qcount = jnp.maximum(cloud.ring_count[jnp.clip(cloud.ring, 0, h - 1)], 1)
    center = (cloud.pos_in_ring.astype(jnp.float32) / qcount.astype(jnp.float32)
              * tcount.astype(jnp.float32)).astype(jnp.int32)

    half = search_window + window_size
    offs = jnp.arange(-half, half + 1, dtype=jnp.int32)
    cand_pos = center[:, None] + offs[None, :]
    in_ring = (cand_pos >= 0) & (cand_pos < tcount[:, None]) & tring_ok[:, None]
    cand_flat = jnp.clip(tstart[:, None] + cand_pos, 0, cloud.capacity - 1)
    rows = packed[cand_flat]                       # [P, 2*half+1, 5]
    rows_ok = in_ring & (rows[..., 4] > 0.5)

    # kd phase: the middle 2*search_window+1 slots are exactly
    # ring_neighbor_search(window=search_window)'s candidates.
    mid = slice(window_size, window_size + 2 * search_window + 1)
    diff = rows[:, mid, :3] - cloud.xyz[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(rows_ok[:, mid], d2, jnp.inf)
    best = jnp.argmin(d2, axis=1)                  # [P] in [0, 2*search_window]
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    found = jnp.isfinite(best_d2) & cloud.valid & (best_d2 < knn_threshold)

    # window phase: slots best +- window around the winner, selected from the
    # gathered arc (indices stay in [0, 2*half] by construction).
    woffs = jnp.arange(-window_size, window_size + 1, iter_step, dtype=jnp.int32)
    sel = best[:, None] + (window_size + woffs)[None, :]
    pts = jnp.take_along_axis(rows[..., :3], sel[..., None], axis=1)
    ok = jnp.take_along_axis(rows_ok, sel, axis=1)
    return pts, (found & eligible)[:, None] & ok


# Opt-in kernel toggle, read ONCE at import: os.environ is not part of the
# jit cache key, so a trace-time read would silently keep the first-traced
# kernel if the var were flipped in-process. The toggle is therefore
# process-startup-only (tools/ab_faithful_kernels.py A/Bs via subprocesses);
# tests thread `fused_kd` explicitly instead of mutating the environment.
_FUSED_KD_DEFAULT = bool(os.environ.get("PLO_FUSED_KD"))
# Gather-free rolled-arc kd mode (see _rolled_adjacent_window): DEFAULT ON
# since round 5 — the interleaved end-to-end A/B measured the faithful
# pipeline at 32.8/32.1 scans/s vs 22.7/21.7 for the two-gather form
# (tools/ab_faithful_kernels.py), and the produced normals match the
# default path to 1e-7 on real ring data (equal-occupancy rings make the
# resampling stride exactly 1). PLO_ROLLED_KD=0 restores the two-gather
# form (the parity oracle).
_ROLLED_KD = os.environ.get("PLO_ROLLED_KD", "1") != "0"
# Window form inside the rolled path: "exact" gathers the +-window rows at
# the found target index (0.1%-level deviation, pays one [P, Wn, 5] gather
# per adjacent ring); "masked" selects window slots from the rolls
# (gather-free, fastest, ~1% degraded normals on occupancy-mismatched rings
# at 32-beam sparsity). Default picked by end-to-end A/B, see
# tools/ab_faithful_kernels.py.
_ROLLED_WINDOW_EXACT = os.environ.get("PLO_ROLLED_WINDOW", "exact") == "exact"


def _rolled_adjacent_window(cloud: RingCloud, packed: jnp.ndarray, offset: int,
                            knn_threshold: float, window_size: int,
                            iter_step: int, eligible: jnp.ndarray,
                            search_window: int = 8,
                            exact_window: bool = None):
    """GATHER-FREE findNearestPoint + window on ring r+offset: ONE [P] row
    gather resamples the adjacent ring onto the query ring's position
    parameterization (center(p) = pos_p * tcount/qcount is monotone in p, so
    the neighbor arc of query p+o is the resampled row p+o — a SHIFTED COPY,
    like _window_shift's self-ring trick); the kd argmin and the +-window
    selection then run over 2*(search_window+window_size)+1 rolls with
    masked accumulation (no [P, W] row gathers, no take_along_axis — both
    measured TPU slow paths).

    Deviation vs the two-gather default: when adjacent-ring occupancies
    differ (tcount != qcount) the arc samples the target ring at stride
    tcount/qcount instead of exactly 1 — inside the scope of the
    ring_neighbor_search kd EMULATION itself (the reference searches a real
    kd-tree over the whole ring, scan_registration.cpp:117-136); ATE parity
    is pinned by the faithful regression test."""
    if exact_window is None:
        exact_window = _ROLLED_WINDOW_EXACT
    h = cloud.ring_start.shape[0]
    p_cap = cloud.capacity
    tring = cloud.ring + offset
    tring_ok = (tring >= 0) & (tring < h)
    tring_c = jnp.clip(tring, 0, h - 1)
    tstart = cloud.ring_start[tring_c]
    tcount = cloud.ring_count[tring_c]
    qcount = jnp.maximum(cloud.ring_count[jnp.clip(cloud.ring, 0, h - 1)], 1)
    center = (cloud.pos_in_ring.astype(jnp.float32) / qcount.astype(jnp.float32)
              * tcount.astype(jnp.float32)).astype(jnp.int32)
    anchor_ok = tring_ok & (center >= 0) & (center < tcount) & cloud.valid
    base_flat = jnp.clip(tstart + jnp.clip(center, 0, tcount - 1), 0, p_cap - 1)
    res = packed[base_flat]                              # ONE [P, 5] gather
    # Bake resample validity + the TARGET ring id into the row so rolls
    # carry everything needed for masking.
    res = res.at[:, 4].set(
        jnp.where(anchor_ok & (res[:, 4] > 0.5), 1.0, 0.0))
    own_tring = tring_c.astype(jnp.float32)

    # Exact-window mode only needs the kd search arc; the masked-sum window
    # additionally reaches up to window_size * qcount/tcount beyond it on
    # occupancy-mismatched rings (+2 slack).
    half = search_window if exact_window else search_window + window_size + 2
    pos_idx = jnp.arange(p_cap, dtype=jnp.int32)
    rolls_xyz, rolls_ok = [], []
    for o in range(-half, half + 1):
        r = jnp.roll(res, -o, axis=0)
        in_bounds = ((pos_idx + o >= 0) & (pos_idx + o < p_cap))
        ok = (r[:, 4] > 0.5) & in_bounds & (r[:, 3] == own_tring)
        rolls_xyz.append(r[:, :3])
        rolls_ok.append(ok)

    # kd phase over the middle 2*search_window+1 rolls.
    best_d2 = jnp.full((p_cap,), jnp.inf, jnp.float32)
    best_rel = jnp.zeros((p_cap,), jnp.int32)            # s* - center, [-sw, sw]
    for o in range(-search_window, search_window + 1):
        i = o + half
        diff = rolls_xyz[i] - cloud.xyz
        d2 = jnp.where(rolls_ok[i], jnp.sum(diff * diff, axis=-1), jnp.inf)
        take = d2 < best_d2                              # strict: first-lowest-o wins ties
        best_d2 = jnp.where(take, d2, best_d2)
        best_rel = jnp.where(take, o, best_rel)
    found = jnp.isfinite(best_d2) & cloud.valid & (best_d2 < knn_threshold)

    if exact_window:
        # EXACT +-window around the found point in TARGET index space via
        # the standard row gather: the stride deviation stays confined to
        # candidate DISCOVERY (an anchor one slot off feeds the same exact
        # window math) — 0.1%-level normal deviation at 32-beam sparsity.
        found_flat = jnp.take(base_flat,
                              jnp.clip(pos_idx + best_rel, 0, p_cap - 1))
        return _window_gather(cloud, packed, found_flat, found & eligible,
                              window_size, iter_step)

    # Gather-free masked-sum window: slot w takes the roll at
    # o = best_rel + round(w * qcount/tcount). Exact when adjacent ring
    # occupancies match (the common case); on mismatched rings consecutive
    # queries can RESAMPLE THE SAME target row (stride < 1 duplicates), which
    # double-weights some window members — ~1% of normals land below 0.9
    # alignment at 32-beam sparsity. Fastest form; see _ROLLED_WINDOW_EXACT
    # for the measured end-to-end A/B that picked the default.
    woffs = list(range(-window_size, window_size + 1, iter_step))
    inv_stride = (qcount.astype(jnp.float32)
                  / jnp.maximum(tcount, 1).astype(jnp.float32))
    o_needed = (best_rel[:, None].astype(jnp.float32)
                + jnp.round(jnp.asarray(woffs, jnp.float32)[None, :]
                            * inv_stride[:, None])).astype(jnp.int32)
    # At stride < 1 consecutive slots can round to the SAME roll — a
    # duplicate window member would double-weight that target row and bias
    # the covariance (measured ~1% of normals below 0.9 alignment at
    # 32-beam sparsity before this guard). Invalidate duplicated slots
    # instead: the affected points lose window members and fail the 'full'
    # count — the pipeline's designed conservative failure — rather than
    # getting silently wrong normals.
    dup = jnp.concatenate(
        [jnp.zeros((p_cap, 1), bool), jnp.diff(o_needed, axis=1) == 0], axis=1)
    pts = jnp.zeros((p_cap, len(woffs), 3), jnp.float32)
    msk = jnp.zeros((p_cap, len(woffs)), bool)
    for o in range(-half, half + 1):
        i = o + half
        sel = (o_needed == o) & rolls_ok[i][:, None] & ~dup   # [P, Wn]
        pts = pts + jnp.where(sel[..., None], rolls_xyz[i][:, None, :], 0.0)
        msk = msk | sel
    return pts, (found & eligible)[:, None] & msk


@partial(jax.jit, static_argnames=("window_size", "iter_step", "neighbor_scan",
                                   "use_all_points", "fused_kd", "rolled_kd"))
def _pca_impl(cloud: RingCloud, window_size: int, iter_step: int,
              knn_distance_threshold: float, neighbor_scan: str,
              distance_threshold: float, valid_points_threshold: float,
              use_all_points: bool, fused_kd: bool = _FUSED_KD_DEFAULT,
              rolled_kd: bool = _ROLLED_KD) -> NormalResult:
    n_win = len(range(-window_size, window_size + 1, iter_step))
    num = 3 * n_win  # required full count (scan_registration.cpp:161,198)

    eligible = _ring_interior_mask(cloud)
    self_idx = jnp.arange(cloud.capacity, dtype=jnp.int32)

    packed = _packed_points(cloud)
    p0, m0 = _window_shift(cloud, packed, eligible, window_size, iter_step)
    # Fused arc gather is OPT-IN (PLO_FUSED_KD=1): it halves gather traffic
    # on paper, but the end-to-end interleaved A/B (tools/
    # ab_faithful_kernels.py) measured the combined new-kernel build 16%
    # slower — take_along_axis on the [P, 23, 5] arc lowers worse than the
    # two straight gathers it replaces.
    if neighbor_scan == "kdtree" and rolled_kd:
        p1, m1 = _rolled_adjacent_window(cloud, packed, -1, knn_distance_threshold,
                                         window_size, iter_step, eligible)
        p2, m2 = _rolled_adjacent_window(cloud, packed, +1, knn_distance_threshold,
                                         window_size, iter_step, eligible)
    elif neighbor_scan == "kdtree" and fused_kd:
        p1, m1 = _fused_adjacent_window(cloud, packed, -1, knn_distance_threshold,
                                        window_size, iter_step, eligible)
        p2, m2 = _fused_adjacent_window(cloud, packed, +1, knn_distance_threshold,
                                        window_size, iter_step, eligible)
    else:
        up_flat, up_ok = _adjacent_ring_index(cloud, -1, neighbor_scan, knn_distance_threshold)
        dn_flat, dn_ok = _adjacent_ring_index(cloud, +1, neighbor_scan, knn_distance_threshold)
        p1, m1 = _window_gather(cloud, packed, up_flat, up_ok & eligible, window_size, iter_step)
        p2, m2 = _window_gather(cloud, packed, dn_flat, dn_ok & eligible, window_size, iter_step)

    pts = jnp.concatenate([p0, p1, p2], axis=1)   # [P, num, 3]
    msk = jnp.concatenate([m0, m1, m2], axis=1)   # [P, num]

    count = jnp.sum(msk, axis=1)
    full = eligible & (count == num)  # pca success requires every slot filled

    w = msk[..., None].astype(jnp.float32)
    denom = jnp.maximum(count[:, None, None].astype(jnp.float32), 1.0)
    centroid = jnp.sum(pts * w, axis=1, keepdims=True) / denom
    centered = (pts - centroid) * w
    cov = jnp.einsum("pni,pnj->pij", centered, centered) / jnp.maximum(
        count[:, None, None].astype(jnp.float32) - 1.0, 1.0
    )

    eigvals, eigvecs = eigh3_descending(cov)  # descending; col 2 = min eigvec

    normal = eigvecs[:, :, 2]
    # Plane validity (scan_registration.cpp:138-156): fraction of window points
    # within distance_threshold of the plane through the centroid.
    dist = jnp.abs(jnp.einsum("pni,pi->pn", pts - centroid, normal))
    n_close = jnp.sum((dist < distance_threshold) & msk, axis=1)
    plane_ok = n_close >= valid_points_threshold * count

    # +z hemisphere flip (:1196-1200).
    flip = jnp.where(normal[:, 2:3] < 0, -1.0, 1.0)
    normal = normal * flip
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nrm, 1e-12)

    plane_fail = full & ~plane_ok
    if use_all_points:
        keep = full  # plane-fail points stay in the model cloud (:1182-1192)
    else:
        keep = full & plane_ok

    out_eigvals = jnp.where(plane_fail[:, None], -1.0, eigvals)

    out = PointCloud(
        xyz=cloud.xyz,
        normal=jnp.where(keep[:, None], normal, 0.0),
        intensity=cloud.intensity,
        curvature=jnp.zeros((cloud.capacity,), jnp.float32),
        eigvals=jnp.where(keep[:, None], out_eigvals, 0.0),
        valid=keep,
    )
    return NormalResult(cloud=out, eigvecs=eigvecs, plane_fail=plane_fail)


def compute_normals_pca(cloud: RingCloud, cfg: PCAConfig, use_all_points: bool,
                        exact_kd: bool = False) -> NormalResult:
    """exact_kd=True forces the two-gather kd path regardless of the rolled
    default — for consumers of the full EIGEN-PAIRS (the tensor-voting
    saliency cascade), where the rolled path's 0.3%-of-points anchor
    deviation measurably perturbs the vote field (an e2e tensor-voting
    collapse at 32-beam test sparsity pinned this; normals-only consumers
    are insensitive — see test_rolled_kd_matches_default_kdtree_path)."""
    return _pca_impl(
        cloud, cfg.window_size, cfg.iter_step, cfg.knn_distance_threshold,
        cfg.neighbor_scan, cfg.plane_constraint.distance_threshold,
        cfg.plane_constraint.valid_points_threshold, use_all_points,
        rolled_kd=False if exact_kd else _ROLLED_KD,
    )


@partial(jax.jit, static_argnames=("neighbor_scan",))
def _cross_product_impl(cloud: RingCloud, knn_distance_threshold: float,
                        neighbor_scan: str) -> NormalResult:
    eligible = _ring_interior_mask(cloud)
    cap = cloud.capacity
    self_idx = jnp.arange(cap, dtype=jnp.int32)

    def ring_offset_pt(off):
        idx = jnp.clip(self_idx + off, 0, cap - 1)
        ok = (self_idx + off >= 0) & (self_idx + off < cap) & (cloud.ring[idx] == cloud.ring)
        return cloud.xyz[idx], ok & gather_mask(cloud.valid, idx)

    fwd, fok = ring_offset_pt(1)
    bwd, bok = ring_offset_pt(-1)
    up_flat, uok = _adjacent_ring_index(cloud, -1, neighbor_scan, knn_distance_threshold)
    dn_flat, dok = _adjacent_ring_index(cloud, +1, neighbor_scan, knn_distance_threshold)
    up = cloud.xyz[up_flat]
    dn = cloud.xyz[dn_flat]

    normal = jnp.cross(fwd - bwd, up - dn)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    ok = eligible & fok & bok & uok & dok & (nn[:, 0] > 1e-12)
    normal = normal / jnp.maximum(nn, 1e-12)
    normal = normal * jnp.where(normal[:, 2:3] < 0, -1.0, 1.0)

    out = PointCloud(
        xyz=cloud.xyz,
        normal=jnp.where(ok[:, None], normal, 0.0),
        intensity=cloud.intensity,
        curvature=jnp.zeros((cap,), jnp.float32),
        eigvals=jnp.zeros((cap, 3), jnp.float32),
        valid=ok,
    )
    return NormalResult(cloud=out, eigvecs=jnp.zeros((cap, 3, 3), jnp.float32),
                        plane_fail=jnp.zeros((cap,), bool))


def compute_normals_cross_product(cloud: RingCloud, cfg: CrossProductConfig) -> NormalResult:
    return _cross_product_impl(cloud, cfg.knn_distance_threshold, cfg.neighbor_scan)


# ---------------------------------------------------------------------------
# Grid-stencil PCA (TPU-native fast path, format="range_image" method="pca")
# ---------------------------------------------------------------------------

def _col_shift(a: jnp.ndarray, t: int) -> jnp.ndarray:
    """out[h, w] = a[h, w+t] with zero fill (no azimuth wrap, mirroring the
    reference's non-wrapping stored-sequence windows)."""
    if t == 0:
        return a
    w = a.shape[1]
    pad = [(0, 0)] * a.ndim
    if t > 0:
        pad[1] = (0, t)
        return jnp.pad(a, pad)[:, t : t + w]
    pad[1] = (-t, 0)
    return jnp.pad(a, pad)[:, :w]


def _row_shift(a: jnp.ndarray, r: int) -> jnp.ndarray:
    """out[h, w] = a[h+r, w] with zero fill."""
    if r == 0:
        return a
    h = a.shape[0]
    pad = [(0, 0)] * a.ndim
    if r > 0:
        pad[0] = (0, r)
        return jnp.pad(a, pad)[r : r + h]
    pad[0] = (-r, 0)
    return jnp.pad(a, pad)[:h]


@partial(jax.jit, static_argnames=("window_size", "iter_step", "search_window",
                                   "use_all_points"))
def _pca_grid_impl(xyzg: jnp.ndarray, occ: jnp.ndarray, window_size: int,
                   iter_step: int, search_window: int,
                   knn_distance_threshold: float, distance_threshold: float,
                   valid_points_threshold: float, use_all_points: bool):
    """PCA normals on the rasterized (ring x azimuth) grid with pure shift
    stencils — the TPU-native re-design of the reference's per-point
    kd-tree/window loop (scan_registration.cpp:117-229, :1161-1229).

    Same math as `_pca_impl` (own-ring +-window, nearest point on rings
    above/below with a +-window around it, 3x3 covariance eigh, plane-validity
    check, +z flip), but the neighbor structure is the azimuth-aligned grid:
      * own-ring window     -> constant column shifts;
      * adjacent-ring NN    -> argmin of distance over column shifts of the
                               row above/below (replaces the kd-tree);
      * window around NN    -> masked moment sums over the same shift stack
                               (slot selected iff shift - s* is a window
                               offset) — no gather ops anywhere.
    All moments are centered on the cell's own point, so f32 is exact to
    window scale. Cells whose 3 x n_win window is not fully occupied fail
    (`full`), matching the reference's complete-window requirement.

    Returns (normal [H,W,3], eigvals [H,W,3] desc, eigvecs [H,W,3,3],
    keep [H,W], plane_fail [H,W]).
    """
    offs = list(range(-window_size, window_size + 1, iter_step))
    n_win = len(offs)
    num = 3 * n_win
    h, w = occ.shape
    sw = search_window
    t_lo, t_hi = offs[0] - sw, offs[-1] + sw

    center = xyzg
    occf = occ.astype(jnp.float32)

    # Row-shifted neighbors (ring above = row-1, below = row+1).
    up_xyz, up_occ = _row_shift(xyzg, -1), _row_shift(occf, -1)
    dn_xyz, dn_occ = _row_shift(xyzg, +1), _row_shift(occf, +1)

    # --- adjacent-ring NN over column shifts s in [-sw, sw] ----------------
    def nn_scan(adj_xyz, adj_occ):
        best_d2 = jnp.full((h, w), jnp.inf, jnp.float32)
        best_s = jnp.zeros((h, w), jnp.int32)
        for s in range(-sw, sw + 1):
            cx = _col_shift(adj_xyz, s)
            co = _col_shift(adj_occ, s) > 0.5
            diff = cx - center
            d2 = jnp.sum(diff * diff, axis=-1)
            d2 = jnp.where(co, d2, jnp.inf)
            take = d2 < best_d2
            best_d2 = jnp.where(take, d2, best_d2)
            best_s = jnp.where(take, s, best_s)
        found = jnp.isfinite(best_d2) & (best_d2 < knn_distance_threshold)
        return best_s, found

    up_s, up_found = nn_scan(up_xyz, up_occ)
    dn_s, dn_found = nn_scan(dn_xyz, dn_occ)

    # --- pass 1: centered moments over the three windows --------------------
    # Slot membership: own ring at shift t iff t in offs; adjacent ring at
    # shift t iff (t - s*) in offs. Centered on the cell's own point.
    def moments():
        cnt = jnp.zeros((h, w), jnp.float32)
        s1 = jnp.zeros((h, w, 3), jnp.float32)
        s2 = jnp.zeros((h, w, 3, 3), jnp.float32)
        for t in range(t_lo, t_hi + 1):
            q_parts = []
            w_parts = []
            if t in offs:  # own ring
                q_parts.append(_col_shift(xyzg, t) - center)
                w_parts.append(_col_shift(occf, t))
            # adjacent rings: membership depends on s*
            for adj_xyz, adj_occ, s_star, fnd in (
                (up_xyz, up_occ, up_s, up_found), (dn_xyz, dn_occ, dn_s, dn_found)):
                rel = t - s_star
                member = jnp.zeros((h, w), bool)
                for o in offs:
                    member = member | (rel == o)
                wgt = jnp.where(member & fnd, _col_shift(adj_occ, t), 0.0)
                q_parts.append(_col_shift(adj_xyz, t) - center)
                w_parts.append(wgt)
            for q, wgt in zip(q_parts, w_parts):
                cnt = cnt + wgt
                s1 = s1 + q * wgt[..., None]
                s2 = s2 + (q[..., :, None] * q[..., None, :]) * wgt[..., None, None]
        return cnt, s1, s2

    cnt, s1, s2 = moments()
    eligible = occ & (jnp.arange(h)[:, None] >= 1) & (jnp.arange(h)[:, None] <= h - 2)
    rowcnt = jnp.sum(occ, axis=1)
    size_ok = ((rowcnt >= 17) & (_row_shift(rowcnt[:, None], -1)[:, 0] >= 17)
               & (_row_shift(rowcnt[:, None], +1)[:, 0] >= 17))
    eligible = eligible & size_ok[:, None]
    full = eligible & (cnt == num)

    denom = jnp.maximum(cnt, 1.0)
    mu_q = s1 / denom[..., None]
    cov = (s2 - denom[..., None, None] * (mu_q[..., :, None] * mu_q[..., None, :])
           ) / jnp.maximum(denom - 1.0, 1.0)[..., None, None]

    eigvals, eigvecs = eigh3_descending(cov.reshape(-1, 3, 3))
    eigvals = eigvals.reshape(h, w, 3)
    eigvecs = eigvecs.reshape(h, w, 3, 3)
    normal = eigvecs[..., :, 2]

    # --- pass 2: plane-validity count (scan_registration.cpp:138-156) -------
    def plane_count():
        n_close = jnp.zeros((h, w), jnp.float32)
        for t in range(t_lo, t_hi + 1):
            if t in offs:
                q = _col_shift(xyzg, t) - center
                d = jnp.abs(jnp.sum((q - mu_q) * normal, axis=-1))
                n_close = n_close + jnp.where(d < distance_threshold,
                                              _col_shift(occf, t), 0.0)
            for adj_xyz, adj_occ, s_star, fnd in (
                (up_xyz, up_occ, up_s, up_found), (dn_xyz, dn_occ, dn_s, dn_found)):
                rel = t - s_star
                member = jnp.zeros((h, w), bool)
                for o in offs:
                    member = member | (rel == o)
                wgt = jnp.where(member & fnd, _col_shift(adj_occ, t), 0.0)
                q = _col_shift(adj_xyz, t) - center
                d = jnp.abs(jnp.sum((q - mu_q) * normal, axis=-1))
                n_close = n_close + jnp.where(d < distance_threshold, wgt, 0.0)
        return n_close

    n_close = plane_count()
    plane_ok = n_close >= valid_points_threshold * cnt

    flip = jnp.where(normal[..., 2:3] < 0, -1.0, 1.0)
    normal = normal * flip
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nrm, 1e-12)

    plane_fail = full & ~plane_ok
    keep = full if use_all_points else (full & plane_ok)
    eigvals = jnp.where(plane_fail[..., None], -1.0, eigvals)
    return normal, eigvals, eigvecs, keep, plane_fail


# ---------------------------------------------------------------------------
# Range-image methods (FALS / SRI)
# ---------------------------------------------------------------------------

def angle_matrices(height: int, width: int, fov_up_deg: float, fov_down_deg: float):
    """Per-pixel azimuth/vertical angles (range_image.cpp:24-38)."""
    fov_up = np.deg2rad(fov_up_deg)
    fov_down = np.deg2rad(fov_down_deg)
    fov_total = fov_up - fov_down
    col = np.arange(width, dtype=np.float32)
    row = np.arange(height, dtype=np.float32)
    azimuth = 2.0 * np.pi * (1.0 - col / width) - np.pi         # [W]
    vertical = fov_down + fov_total * (1.0 - row / height)      # [H]
    az = np.broadcast_to(azimuth[None, :], (height, width))
    ve = np.broadcast_to(vertical[:, None], (height, width))
    return az.astype(np.float32), ve.astype(np.float32)


def _v_field(az: np.ndarray, ve: np.ndarray) -> np.ndarray:
    """The reference's v vector per pixel: [sin t cos p, sin p, cos t cos p]
    (range_image.cpp:65-68)."""
    return np.stack(
        [np.sin(az) * np.cos(ve), np.sin(ve), np.cos(az) * np.cos(ve)], axis=-1
    ).astype(np.float32)


def fals_m_inv(height: int, width: int, window_size: int,
               fov_up_deg: float, fov_down_deg: float) -> np.ndarray:
    """Precomputed per-pixel M^-1 (range_image.cpp:40-84). M sums v v^T over all
    in-bounds window cells regardless of occupancy (reference quirk)."""
    az, ve = angle_matrices(height, width, fov_up_deg, fov_down_deg)
    v = _v_field(az, ve)  # [H, W, 3]
    vvt = np.einsum("hwi,hwj->hwij", v, v)
    M = np.zeros((height, width, 3, 3), np.float64)
    for di in range(-window_size, window_size + 1):
        r0, r1 = max(0, -di), min(height, height - di)
        for dj in range(-window_size, window_size + 1):
            c0, c1 = max(0, -dj), min(width, width - dj)
            M[r0:r1, c0:c1] += vvt[r0 + di : r1 + di, c0 + dj : c1 + dj]
    det = np.linalg.det(M)
    ok = det > 1e-6
    Minv = np.zeros_like(M)
    Minv[ok] = np.linalg.inv(M[ok])
    return Minv.astype(np.float32)


def _shifted(x: jnp.ndarray, di: int, dj: int, fill) -> jnp.ndarray:
    """x shifted so out[r, c] = x[r+di, c+dj] (out-of-bounds -> fill)."""
    h, w = x.shape[:2]
    out = jnp.full_like(x, fill)
    r0, r1 = max(0, -di), min(h, h - di)
    c0, c1 = max(0, -dj), min(w, w - dj)
    return out.at[r0:r1, c0:c1].set(x[r0 + di : r1 + di, c0 + dj : c1 + dj])


@partial(jax.jit, static_argnames=("window_size",))
def _fals_impl(rng_img: jnp.ndarray, v: jnp.ndarray, m_inv: jnp.ndarray,
               window_size: int):
    occ = jnp.isfinite(rng_img)
    inv_r = jnp.where(occ, 1.0 / jnp.maximum(rng_img, 1e-9), 0.0)
    contrib = v * inv_r[..., None]  # [H, W, 3] — v/r for occupied cells
    b = jnp.zeros_like(v)
    for di in range(-window_size, window_size + 1):
        for dj in range(-window_size, window_size + 1):
            b = b + _shifted(contrib, di, dj, 0.0)
    normal = jnp.einsum("hwij,hwj->hwi", m_inv, b)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    ok = occ & (nn[..., 0] > 1e-12) & jnp.any(m_inv != 0.0, axis=(-1, -2))
    normal = normal / jnp.maximum(nn, 1e-12)
    normal = normal * jnp.where(normal[..., 2:3] < 0, -1.0, 1.0)
    return normal, ok


@partial(jax.jit, static_argnames=("window_size",))
def _sri_impl(rng_img: jnp.ndarray, vertical: jnp.ndarray, rhat: jnp.ndarray,
              window_size: int):
    h, w = rng_img.shape
    occ = jnp.isfinite(rng_img)
    r_safe = jnp.where(occ, rng_img, 0.0)

    dr_dtheta = jnp.zeros_like(rng_img)
    dr_dphi = jnp.zeros_like(rng_img)
    for di in range(-window_size, window_size + 1):
        for dj in range(-window_size, window_size + 1):
            neigh = _shifted(r_safe, di, dj, 0.0)
            mx = 1.0 if dj < 0 else (-1.0 if dj > 0 else 0.0)  # Prewitt (range_image.cpp:201-215)
            my = 1.0 if di < 0 else (-1.0 if di > 0 else 0.0)
            if mx:
                dr_dtheta = dr_dtheta + mx * neigh
            if my:
                dr_dphi = dr_dphi + my * neigh

    r = jnp.maximum(rng_img, 1e-9)
    grad = jnp.stack(
        [jnp.ones_like(r), dr_dtheta / (r * jnp.cos(vertical)), dr_dphi / r], axis=-1
    )
    normal = jnp.einsum("hwij,hwj->hwi", rhat, grad)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    # Border rows/cols excluded (range_image.cpp:218-219).
    rr = jnp.arange(h)[:, None]
    cc = jnp.arange(w)[None, :]
    interior = (rr >= window_size) & (rr < h - window_size) & (cc >= window_size) & (cc < w - window_size)
    ok = occ & interior & (nn[..., 0] > 1e-12)
    normal = normal / jnp.maximum(nn, 1e-12)
    normal = normal * jnp.where(normal[..., 2:3] < 0, -1.0, 1.0)
    return normal, ok


@partial(jax.jit, static_argnames=("window_size",))
def _curvature_map_impl(rng_img: jnp.ndarray, az: jnp.ndarray, ve: jnp.ndarray,
                        window_size: int) -> jnp.ndarray:
    """Range-image curvature map (range_image.cpp:263-322).

    Per pixel: reconstruct the 3-D point from (r, azimuth, vertical), sum
    (neighbor - center) over +-window_size rows of the SAME column (the
    reference's column loop is commented out), skipping unoccupied (inf)
    neighbors; curvature = ||sum||^2. Border rows/cols stay 0, as do
    unoccupied centers. Implemented as a pure vertical shift stencil —
    no gathers. Unused by the reference pipeline (SURVEY.md §1 vestigial
    surface) but part of the RangeImage public API (range_image.h:12-59).
    """
    h, w = rng_img.shape
    occ = jnp.isfinite(rng_img)
    r_safe = jnp.where(occ, rng_img, 0.0)
    # p = [r cos(ve) cos(az), r cos(ve) sin(az), r sin(ve)]
    pts = r_safe[..., None] * jnp.stack(
        [jnp.cos(ve) * jnp.cos(az), jnp.cos(ve) * jnp.sin(az), jnp.sin(ve)], axis=-1)
    diff = jnp.zeros_like(pts)
    cnt = jnp.zeros(rng_img.shape, jnp.float32)
    for di in range(-window_size, window_size + 1):
        n_pts = _shifted(pts, di, 0, 0.0)
        n_occ = _shifted(occ, di, 0, False)
        diff = diff + jnp.where(n_occ[..., None], n_pts - pts, 0.0)
        cnt = cnt + n_occ
    curv = jnp.sum(diff * diff, axis=-1)
    rr = jnp.arange(h)[:, None]
    cc = jnp.arange(w)[None, :]
    interior = (rr >= window_size) & (rr < h - window_size) & \
               (cc >= window_size) & (cc < w - window_size)
    return jnp.where(occ & interior, curv, 0.0)


def compute_normals_pca_grid(xyzg: jnp.ndarray, occ: jnp.ndarray, cfg: PCAConfig,
                             use_all_points: bool, search_window: int = 8):
    """Grid-stencil PCA on the rasterized range image (see `_pca_grid_impl`)."""
    return _pca_grid_impl(
        xyzg, occ, cfg.window_size, cfg.iter_step, search_window,
        cfg.knn_distance_threshold, cfg.plane_constraint.distance_threshold,
        cfg.plane_constraint.valid_points_threshold, use_all_points,
    )


def sri_rhat(height: int, width: int, fov_up_deg: float, fov_down_deg: float) -> np.ndarray:
    """Per-pixel Rhat = [zhat xhat yhat] * R_theta * R_phi (range_image.cpp:86-115)."""
    az, ve = angle_matrices(height, width, fov_up_deg, fov_down_deg)
    ct, st = np.cos(az), np.sin(az)
    cp, sp = np.cos(ve), np.sin(ve)
    zeros = np.zeros_like(ct)
    ones = np.ones_like(ct)
    R_theta = np.stack(
        [np.stack([ct, -st, zeros], -1), np.stack([st, ct, zeros], -1),
         np.stack([zeros, zeros, ones], -1)], axis=-2)
    R_phi = np.stack(
        [np.stack([cp, zeros, -sp], -1), np.stack([zeros, ones, zeros], -1),
         np.stack([sp, zeros, cp], -1)], axis=-2)
    R = R_theta @ R_phi
    perm = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float32)  # cols z,x,y
    return (perm @ R).astype(np.float32)


class RangeImageNormals:
    """Stateful wrapper holding the precomputed per-pixel constants (the
    reference's lazy statics, range_image.cpp:7-22)."""

    def __init__(self, height: int, width: int, fov_up_deg: float, fov_down_deg: float,
                 window_size: int):
        az, ve = angle_matrices(height, width, fov_up_deg, fov_down_deg)
        self.window_size = window_size
        self.azimuth = jnp.asarray(az)
        self.vertical = jnp.asarray(ve)
        self.v = jnp.asarray(_v_field(az, ve))
        self.m_inv = jnp.asarray(fals_m_inv(height, width, window_size, fov_up_deg, fov_down_deg))
        self.rhat = jnp.asarray(sri_rhat(height, width, fov_up_deg, fov_down_deg))

    def fals(self, rng_img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return _fals_impl(rng_img, self.v, self.m_inv, self.window_size)

    def sri(self, rng_img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return _sri_impl(rng_img, self.vertical, self.rhat, self.window_size)

    def curvature_map(self, rng_img: jnp.ndarray, window_size: int = None) -> jnp.ndarray:
        ws = self.window_size if window_size is None else window_size
        return _curvature_map_impl(rng_img, self.azimuth, self.vertical, ws)
