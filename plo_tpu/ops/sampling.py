"""Stage 3b — sampling: three-axis, random, normal-direction binning,
major-axis weighted binning, and farthest-point sampling.

Every sampler returns a fixed-size index set `(idx [S], valid [S])` — the
padded analog of the reference's `sampled_indices` vector
(scan_registration.cpp:1401,1496-1501).

Reference parity:
  * three_axis: 9 ranked score lists from a2D and p x n, top points_per_list
    from each, duplicates allowed (scan_registration.cpp:492-533).
  * random: shuffle candidates, take first max_points (:566-582) — here a
    keyed permutation (deterministic per key; the reference's RNG is seeded
    from random_device, so parity is statistical, SURVEY.md §7.3).
  * normal: spherical histogram of normal directions (azimuth x elevation
    bins); bins below min dropped, above max downsampled (:536-629).
  * major_axis: same histogram, bins weighted by mean distance of (subsampled)
    bin members to the previous frame's cloud under a cylinder constraint
    (||p-q|| < r_proj and ||(p-q) x n|| < r, >= 3 neighbors); per-bin quota =
    weight * max_total_points (:631-759). Frame 1 falls back to `normal`
    (:783).
  * FPS: exact greedy farthest-point traversal (common.cpp:19-85), expressed
    as a fori_loop with O(N) masked argmax per step — used for RANSAC seeds
    and per-bin FPS sampling.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

INF = jnp.inf

# Pallas cylinder kernel toggle, read ONCE at import: os.environ is not part
# of the jit cache key, so a trace-time read would silently keep the
# first-traced kernel if the var were flipped in-process. Process-startup-only
# by design (tools/ab_faithful_kernels.py A/Bs via subprocesses).
# DEFAULT ON for TPU since round 5: the interleaved end-to-end A/B now
# measures it ~10% faster (21.0/19.1 vs 19.2/16.9 scans/s) — in round 4 it
# lost 16%, but the ICP side has since been optimized (hybrid refresh +
# staged RANSAC) and the front-end fusion context changed. Set
# PLO_PALLAS_CYLINDER=0 to fall back to the pure-XLA scan form (the kernel's
# oracle, tests/test_pallas_nn.py).
_PALLAS_CYLINDER = os.environ.get("PLO_PALLAS_CYLINDER", "1") != "0"
# Same contract for the batched-bin FPS kernel (PLO_PALLAS_FPS=0 falls back
# to the XLA while_loop form — the kernel's oracle).
_PALLAS_FPS = os.environ.get("PLO_PALLAS_FPS", "1") != "0"
# compact_indices form: "sort" (full-P argsort, DEFAULT) vs "scatter"
# (cumsum + one drop-mode scatter). Same kept prefix in the same stable
# order either way; only the idx values under valid=False padding differ
# (0 vs arbitrary non-kept indices — both in-bounds, both masked by every
# consumer). The interleaved end-to-end A/B (round 5, bench_faithful
# protocol) measured the scatter form consistently SLOWER — 24.9/21.9 vs
# 27.0/26.8 scans/s for sort across two interleaved rounds: a bool-key
# argsort lowers to a cheap single-operand sort while a 57.6k scatter pays
# the TPU serialized-scatter path — so sort stays the default and the
# scatter form remains only as the A/B arm + parity test.
_COMPACT_SCATTER = os.environ.get("PLO_COMPACT", "sort") == "scatter"
# Valid-prefix tile skipping in the Pallas cylinder kernel (PLO_CYL_LIVE=0
# restores the full-capacity loop — the A/B baseline arm). Exact either way:
# skipped tiles hold only +inf padding that can never pass the d2 gate.
# Interleaved A/B: 27.8/25.6 vs 27.0/26.8 — WITHIN link noise end-to-end
# (the ~23% tile cut only touches the ~5 ms cylinder pass); kept as default
# because it is strictly less kernel work at zero deviation
# (tests/test_pallas_nn.py::test_pallas_cylinder_live_prefix_matches_full).
_CYL_LIVE = os.environ.get("PLO_CYL_LIVE", "1") != "0"
# _rank_within_bins sort form: "lex" (two-key lexsort) vs "packed" (single
# i32 key = bin<<24 | 24-bit-quantized score; one-operand stable argsort).
# Ordering is identical except that score ties occur at 2^-24 instead of
# f32 resolution — both resolve by stable original-index order, and every
# caller's scores are uniform random, so the sampling semantics are
# unchanged. Interleaved end-to-end A/B: WITHIN NOISE and crossed
# (lex 23.6/29.3 vs packed 27.4/26.2 scans/s) — the [P] sort is not a
# meaningful slice of the faithful wall, so the two-key lexsort stays the
# default and packed remains an A/B arm with a parity test
# (test_rank_within_bins_packed_matches_lexsort).
_RANK_PACKED = os.environ.get("PLO_RANK", "lex") == "packed"


def compact_indices(keep: jnp.ndarray, size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact a boolean mask over [P] into a fixed-size index list [size]:
    kept indices first in ascending order (the stable compaction every
    sampler needs), `valid[j] = j < n_kept`."""
    p = keep.shape[0]
    n_keep = jnp.sum(keep.astype(jnp.int32))
    valid = jnp.arange(size) < n_keep
    if _COMPACT_SCATTER:
        # Prefix-sum destination + one drop-mode scatter — replaces the
        # full-P sort (TPU sorts are multi-pass; the scatter is one).
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        tgt = jnp.where(keep, pos, size)  # out-of-range => dropped
        idx = jnp.zeros((size,), jnp.int32).at[tgt].set(
            jnp.arange(p, dtype=jnp.int32), mode="drop")
        return idx, valid
    order = jnp.argsort(~keep, stable=True)  # kept points first, stable order
    idx = order[:size]
    return idx.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("max_points",))
def random_sampling(candidates: jnp.ndarray, key: jnp.ndarray, max_points: int):
    """Keyed-permutation subset of candidate points (scan_registration.cpp:566-582)."""
    p = candidates.shape[0]
    scores = jax.random.uniform(key, (p,))
    scores = jnp.where(candidates, scores, INF)
    order = jnp.argsort(scores)
    idx = order[:max_points].astype(jnp.int32)
    valid = jnp.arange(max_points) < jnp.sum(candidates.astype(jnp.int32))
    return idx, valid


def spherical_bins(normals: jnp.ndarray, azimuth_bins: int, elevation_bins: int) -> jnp.ndarray:
    """Bin id of each normal direction (computeSphericalHistogram,
    scan_registration.cpp:536-564). Returns [P] i32 in [0, Ab*Eb)."""
    az = jnp.arctan2(normals[:, 1], normals[:, 0])
    el = jnp.arcsin(jnp.clip(normals[:, 2], -1.0, 1.0))
    az = jnp.where(az < 0, az + 2 * jnp.pi, az)
    el = el + jnp.pi / 2
    ai = jnp.minimum((az / (2 * jnp.pi / azimuth_bins)).astype(jnp.int32), azimuth_bins - 1)
    ei = jnp.minimum((el / (jnp.pi / elevation_bins)).astype(jnp.int32), elevation_bins - 1)
    return ai * elevation_bins + ei


def _rank_within_bins(bins: jnp.ndarray, member: jnp.ndarray, scores: jnp.ndarray,
                      n_bins: int):
    """Rank (0-based) of each member within its bin, ordered by ascending
    score. Non-members get a huge rank. Also returns per-bin counts."""
    p = bins.shape[0]
    safe_bins = jnp.where(member, bins, n_bins)
    counts = jnp.bincount(safe_bins, length=n_bins + 1)[:n_bins]
    # Sort by (bin, score); position within segment = rank.
    if _RANK_PACKED:
        # Single-operand stable sort: bin in the high bits, the score
        # quantized to 24 bits below (scores are uniform [0,1) at every call
        # site; requires n_bins < 128 — spherical histograms are 64).
        q = jnp.clip((scores * (1 << 24)).astype(jnp.int32), 0, (1 << 24) - 1)
        key = (safe_bins << 24) | jnp.where(member, q, (1 << 24) - 1)
        order = jnp.argsort(key, stable=True)
    else:
        order = jnp.lexsort((jnp.where(member, scores, INF), safe_bins))
    sorted_bins = safe_bins[order]
    starts = jnp.searchsorted(sorted_bins, jnp.arange(n_bins + 1))
    rank_sorted = jnp.arange(p) - starts[jnp.clip(sorted_bins, 0, n_bins)]
    rank = jnp.zeros((p,), jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))
    rank = jnp.where(member, rank, p)
    return rank, counts


@partial(jax.jit, static_argnames=("azimuth_bins", "elevation_bins",
                                   "min_points_per_bin", "max_points_per_bin",
                                   "out_size", "strategy"))
def normal_sampling(normals: jnp.ndarray, candidates: jnp.ndarray, key: jnp.ndarray,
                    azimuth_bins: int, elevation_bins: int,
                    min_points_per_bin: int, max_points_per_bin: int,
                    out_size: int, strategy: str = "random", xyz=None):
    """Spherical-histogram sampling (normalSampling, scan_registration.cpp:584-629).

    `out_size` is the static output capacity (azimuth*elevation*max is the
    exact bound). Within-bin downsampling rank comes from a random score
    (strategy="random") or an exact farthest-first traversal
    (strategy="FPS", scan_registration.cpp:605-614; requires `xyz`).
    """
    n_bins = azimuth_bins * elevation_bins
    bins = spherical_bins(normals, azimuth_bins, elevation_bins)
    if strategy == "FPS":
        rank, counts = fps_rank_within_bins(
            xyz, bins, candidates, key, n_bins, bin_capacity=1024,
            max_rank=max_points_per_bin)
    else:
        scores = jax.random.uniform(key, (candidates.shape[0],))
        rank, counts = _rank_within_bins(bins, candidates, scores, n_bins)
    binc = counts[jnp.clip(bins, 0, n_bins - 1)]
    keep = candidates & (binc >= min_points_per_bin) & (rank < max_points_per_bin)
    return compact_indices(keep, out_size)


@partial(jax.jit, static_argnames=("chunk",))
def cylinder_stats(query: jnp.ndarray, normal: jnp.ndarray,
                   target: jnp.ndarray, target_valid: jnp.ndarray,
                   r_proj: float, r: float, chunk: int = 4096):
    """Per-query neighbor count and summed distance over the previous cloud
    under the cylinder gates ||p-q|| < r_proj and ||(p-q) x n|| < r
    (majorAxisSampling inner loop, scan_registration.cpp:676-701).
    Returns (count [Q] i32, dist_sum [Q] f32).

    Form note (measured on the chip, 12.8k x 57.6k): the coordinate-
    difference chain FUSES into one XLA loop (no [Q, C] materialization);
    rewriting d2/p2 as [Q,3]x[3,C] matmuls measured 2.3x SLOWER (24.6 vs
    10.5 ms) because dot outputs cannot fuse into their epilogue — two
    [Q, C] f32 tensors round-trip HBM per chunk. The one algebraic win that
    survives fusion is |d x n|^2 = d2 |n|^2 - (d.n)^2 (8 ops vs the 14-op
    cross product). Its cancellation error (~1e-3 m^2) is noise against the
    r^2 gate widths — this kernel produces a WEIGHT STATISTIC (mean neighbor
    distance), not neighbor identities, so the exact-distance rule of
    ops/neighbors.py does not apply; the f64 oracle bound is asserted in
    test_features_sampling.py::test_cylinder_stats_oracle.

    Each scan step builds [Q, chunk] f32 intermediates (~840 MB at Q=12.8k,
    chunk=16384 before XLA fusion) — sized for TPU; pass a smaller chunk on
    hosts with tight memory."""
    t = target.shape[0]
    n_chunks = -(-t // chunk)
    pad = n_chunks * chunk - t
    tp = jnp.pad(target, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
    tv = jnp.pad(target_valid, (0, pad)).reshape(n_chunks, chunk)
    nx, ny, nz = normal[:, 0:1], normal[:, 1:2], normal[:, 2:3]
    n2 = jnp.sum(normal * normal, axis=-1)        # [Q]

    def body(carry, inputs):
        cnt, dsum = carry
        tc, vc = inputs                            # [C, 3], [C]
        dx = query[:, 0:1] - tc[None, :, 0]
        dy = query[:, 1:2] - tc[None, :, 1]
        dz = query[:, 2:3] - tc[None, :, 2]
        d2 = dx * dx + dy * dy + dz * dz
        dn = dx * nx + dy * ny + dz * nz
        p2 = d2 * n2[:, None] - dn * dn
        ok = vc[None, :] & (d2 < r_proj * r_proj) & (p2 < r * r)
        cnt = cnt + jnp.sum(ok, axis=1)
        dsum = dsum + jnp.sum(jnp.where(ok, jnp.sqrt(d2), 0.0), axis=1)
        return (cnt, dsum), None

    init = (jnp.zeros((query.shape[0],), jnp.int32), jnp.zeros((query.shape[0],), jnp.float32))
    (cnt, dsum), _ = jax.lax.scan(body, init, (tp, tv))
    return cnt, dsum


@partial(jax.jit, static_argnames=("r", "r_proj", "azimuth_bins", "elevation_bins",
                                   "min_points_per_bin", "max_points_per_bin",
                                   "max_total_points", "out_size", "strategy"))
def major_axis_sampling(xyz: jnp.ndarray, normals: jnp.ndarray, candidates: jnp.ndarray,
                        last_xyz: jnp.ndarray, last_valid: jnp.ndarray, key: jnp.ndarray,
                        r: float, r_proj: float, max_total_points: int,
                        azimuth_bins: int, elevation_bins: int,
                        min_points_per_bin: int, max_points_per_bin: int,
                        out_size: int, strategy: str = "random"):
    """Weighted-bin sampling against the previous frame's cloud
    (majorAxisSampling, scan_registration.cpp:631-759). The quota-phase
    selection uses random or exact-FPS within-bin ranks per
    `strategy` (:736-748); the weight-estimation subsample is always random
    (:658-664)."""
    n_bins = azimuth_bins * elevation_bins
    k_sub, k_sel = jax.random.split(key)
    bins = spherical_bins(normals, azimuth_bins, elevation_bins)

    # Phase 1 — weight estimation on a per-bin random subsample of up to
    # max_points_per_bin members (:658-664). The cylinder scan against the
    # previous cloud runs on the COMPACTED subsample (<= n_bins *
    # max_points_per_bin points), not the full candidate set: the reference
    # only ever scans the subsampled bin members, and at HDL-64 scale the
    # difference is a 57.6k x 57.6k pass vs a 12.8k x 57.6k one (24 -> 5 ms).
    sub_scores = jax.random.uniform(k_sub, (candidates.shape[0],))
    rank, counts = _rank_within_bins(bins, candidates, sub_scores, n_bins)
    binc = counts[jnp.clip(bins, 0, n_bins - 1)]
    bin_live = binc >= min_points_per_bin
    in_subsample = candidates & bin_live & (rank < max_points_per_bin)

    # Static bound on subsample size (never beyond the cloud itself —
    # compact_indices returns idx[min(size, P)] and a [size] mask, which
    # desynchronize when size > P).
    sub_cap = min(n_bins * max_points_per_bin, candidates.shape[0])
    sub_idx, sub_valid = compact_indices(in_subsample, sub_cap)
    if jax.default_backend() == "tpu" and _PALLAS_CYLINDER:
        # Pallas streaming form: one pass over the previous cloud per query
        # block with register-resident (count, sum) accumulators — same math
        # as the XLA scan below (its oracle), no [Q, chunk] intermediates.
        # 2.3x faster standalone (5.5 vs 12.6 ms chained at 12.8k x 57.6k)
        # and ~10% faster end-to-end in the round-5 interleaved A/B
        # (tools/ab_faithful_kernels.py) — default ON for TPU (see
        # _PALLAS_CYLINDER above).
        from plo_tpu.ops import pallas_nn
        # Valid-prefix bound: the previous filtered cloud is ring-counting-
        # sort compacted (ops/preprocess.py), so no valid row sits past
        # max(valid index)+1 — the kernel skips the all-padding tail tiles
        # (~23% of capacity at HDL-64 occupancy).
        p_t = last_valid.shape[0]
        t_live = (jnp.max(jnp.where(
            last_valid, jnp.arange(1, p_t + 1, dtype=jnp.int32), 0))
            if _CYL_LIVE else None)
        cnt, dsum = pallas_nn.cylinder_stats(xyz[sub_idx], normals[sub_idx],
                                             last_xyz, last_valid, r_proj, r,
                                             t_live=t_live)
    else:
        # chunk=16384 measured fastest on the chip at this 12.8k x 57.6k
        # shape; CPU hosts keep the conservative 4096 default (each scan-body
        # intermediate is [Q, chunk] f32 before XLA fusion — at 16384 that is
        # ~840 MB of pre-fusion intermediates a small host should not build).
        cnt, dsum = cylinder_stats(xyz[sub_idx], normals[sub_idx],
                                   last_xyz, last_valid, r_proj, r,
                                   chunk=16384 if jax.default_backend() == "tpu" else 4096)
    has3 = sub_valid & (cnt >= 3)
    avg_dist = jnp.where(has3, dsum / jnp.maximum(cnt, 1).astype(jnp.float32), 0.0)

    safe_bins = jnp.where(has3, bins[sub_idx], n_bins)
    bin_valid_samples = jnp.bincount(safe_bins, length=n_bins + 1)[:n_bins]
    bin_dist_sum = jnp.zeros((n_bins + 1,), jnp.float32).at[safe_bins].add(avg_dist)[:n_bins]
    bin_weight = jnp.where(
        bin_valid_samples >= 3,
        bin_dist_sum / jnp.maximum(bin_valid_samples, 1).astype(jnp.float32),
        0.0,
    )
    total_w = jnp.sum(bin_weight)
    bin_weight = jnp.where(total_w > 0, bin_weight / jnp.maximum(total_w, 1e-12), 0.0)

    # Phase 2 — quota selection (:726-758): quota = min(weight*max_total, size).
    quota = jnp.minimum((bin_weight * max_total_points).astype(jnp.int32), counts)
    if strategy == "FPS":
        # Clamp each quota to the FPS rank range: members beyond the
        # traversal capacity carry the max_rank SENTINEL, and a quota above
        # it would let them pass `rank2 < my_quota` unranked — silently
        # over-selecting past max_total_points (and past what _slice_flat
        # assumes downstream).
        max_rank = min(max_total_points, 1024)
        quota = jnp.minimum(quota, max_rank)
        # Farthest-first ranks are only consulted below each bin's quota, so
        # the traversal can stop at the largest quota (dynamic `needed`
        # bound) — typically ~10x fewer sequential steps than the static cap.
        rank2, _ = fps_rank_within_bins(
            xyz, bins, candidates, k_sel, n_bins, bin_capacity=1024,
            max_rank=max_rank, needed=jnp.max(quota))
    else:
        sel_scores = jax.random.uniform(k_sel, (candidates.shape[0],))
        rank2, _ = _rank_within_bins(bins, candidates, sel_scores, n_bins)
    my_quota = quota[jnp.clip(bins, 0, n_bins - 1)]
    keep = candidates & bin_live & (rank2 < my_quota)
    return compact_indices(keep, out_size)


@partial(jax.jit, static_argnames=("points_per_list",))
def three_axis_sampling(xyz: jnp.ndarray, normals: jnp.ndarray, eigvals: jnp.ndarray,
                        candidates: jnp.ndarray, points_per_list: int):
    """IMLS-SLAM three-axis sampling (threeAxisSampling,
    scan_registration.cpp:492-533): 9 score lists, top points_per_list from
    each, duplicates allowed. Output size = 9 * points_per_list."""
    safe = lambda x: jnp.maximum(x, 1e-20)
    l1, l2, l3 = eigvals[:, 0], eigvals[:, 1], eigvals[:, 2]
    aD = (jnp.sqrt(safe(l2)) - jnp.sqrt(safe(l3))) / jnp.sqrt(safe(l1))
    a2d = aD * aD
    cross = jnp.cross(xyz, normals)
    scores = jnp.stack(
        [
            a2d * cross[:, 0], -a2d * cross[:, 0],
            a2d * cross[:, 1], -a2d * cross[:, 1],
            a2d * cross[:, 2], -a2d * cross[:, 2],
            a2d * jnp.abs(normals[:, 0]),
            a2d * jnp.abs(normals[:, 1]),
            a2d * jnp.abs(normals[:, 2]),
        ],
        axis=0,
    )  # [9, P]
    scores = jnp.where(candidates[None, :], scores, -INF)
    top_vals, top_idx = jax.lax.top_k(scores, points_per_list)  # [9, k]
    n_cand = jnp.sum(candidates.astype(jnp.int32))
    per_list_valid = jnp.broadcast_to(
        jnp.arange(points_per_list)[None, :] < jnp.minimum(points_per_list, n_cand),
        (9, points_per_list),
    )
    return top_idx.reshape(-1).astype(jnp.int32), per_list_valid.reshape(-1)


@partial(jax.jit, static_argnames=("n_bins", "bin_capacity", "max_rank", "unroll"))
def fps_rank_within_bins(xyz: jnp.ndarray, bins: jnp.ndarray, member: jnp.ndarray,
                         key: jnp.ndarray, n_bins: int, bin_capacity: int,
                         max_rank: int, needed=None, unroll: int = 1):
    """Farthest-point-sampling rank of each member within its bin.

    The reference's per-bin FPS strategy (normalSampling / majorAxisSampling
    with sampling_strategy=="FPS", scan_registration.cpp:605-614, 736-744)
    selects the first `quota` points of a greedy farthest-first traversal; the
    FPS rank (0 = seed) makes that a `rank < quota` mask exactly like the
    random strategy. Bins larger than `bin_capacity` are truncated to a random
    subset (bin membership beyond capacity gets rank = max_rank, i.e. never
    selected); ranks beyond `max_rank` are not distinguished.

    `needed` (optional traced i32) stops the traversal once ranks 0..needed-1
    are assigned — exact when callers only consult ranks < needed (quotas);
    unassigned ranks keep the max_rank sentinel either way.

    Implementation: segment-compact members into a dense [n_bins, bin_capacity]
    table, run one batched farthest-first step per loop iteration over all
    bins at once (row argmax + row gather + elementwise min; no scatters in
    the loop body — TPU scatters would dominate), scatter ranks back once.
    O(n_bins * bin_capacity * steps) elementwise work.
    """
    p = xyz.shape[0]
    # Random within-bin order (also the truncation choice for huge bins).
    scores = jax.random.uniform(key, (p,))
    rank0, counts = _rank_within_bins(bins, member, scores, n_bins)
    slot_ok = member & (rank0 < bin_capacity)
    dest = jnp.where(slot_ok, jnp.clip(bins, 0, n_bins - 1) * bin_capacity + rank0,
                     n_bins * bin_capacity)
    # ONE packed scatter builds all three tables (xyz, occupancy, source
    # index) — TPU scatters cost ~1 ms each at this size, and the three
    # separate scatters this replaces were the dominant cost of the table
    # build (same packed-payload trick as the preprocess counting sort).
    payload = jnp.concatenate(
        [xyz, jnp.ones((p, 1), jnp.float32),
         jnp.arange(p, dtype=jnp.float32)[:, None]], axis=1)
    packed = (jnp.zeros((n_bins * bin_capacity + 1, 5), jnp.float32)
              .at[dest].set(payload)[:-1])
    table_xyz = packed[:, :3].reshape(n_bins, bin_capacity, 3)
    table_occ = packed[:, 3].reshape(n_bins, bin_capacity)
    # Empty slots carry src 0 from the zeros-init; occ=0 there, and the
    # final rank scatter sends them to the dump row p (src mapped below).
    src_f = packed[:, 4]
    src_index = jnp.where(table_occ.reshape(-1) > 0.5, src_f.astype(jnp.int32),
                          p).reshape(n_bins, bin_capacity)

    if jax.default_backend() == "tpu" and _PALLAS_FPS:
        # All bins x all steps inside ONE Pallas kernel: the XLA while_loop
        # below pays per-step dispatch overhead (~25 us x needed steps — the
        # 5.4 ms 'per-bin FPS' knockout row), the kernel runs every step on
        # the VMEM-resident [B, C] tables (tests/test_pallas_nn.py pins
        # interpret-mode equality with the while_loop form).
        from plo_tpu.ops import pallas_nn
        n_steps = (max_rank if needed is None
                   else jnp.minimum(jnp.asarray(needed, jnp.int32), max_rank))
        bin_ranks = pallas_nn.fps_ranks(table_xyz, table_occ, n_steps, max_rank)
        flat_rank = jnp.full((p + 1,), max_rank, jnp.int32).at[
            src_index.reshape(-1)].set(bin_ranks.reshape(-1))[:p]
        return jnp.where(member, flat_rank, max_rank), counts

    occ = table_occ > 0.5                               # [B, C]
    col = jnp.arange(bin_capacity, dtype=jnp.int32)[None, :]
    rows = jnp.arange(n_bins)

    def seed_d2(sel):  # squared distances to the per-bin selected point
        diff = table_xyz - sel[:, None, :]
        return jnp.sum(diff * diff, axis=-1)            # [B, C]

    # Seed = slot 0 (a uniformly random member, since within-bin order is
    # random). Farthest-first order under squared distance equals the
    # reference's (common.cpp:19-85) — the square is monotone.
    first = jnp.argmax(occ, axis=1)                     # [B]
    any_occ = jnp.any(occ, axis=1)
    is_first = col == first[:, None]
    min_d = jnp.where(occ & ~is_first, seed_d2(table_xyz[rows, first]), -INF)
    ranks = jnp.where(is_first & any_occ[:, None], 0, max_rank).astype(jnp.int32)

    n_steps = (max_rank if needed is None
               else jnp.minimum(jnp.asarray(needed, jnp.int32), max_rank))

    def cond(carry):
        i, _, _ = carry
        return i < n_steps

    def step(carry):
        # `unroll` farthest-first picks per while_loop trip. Measured on the
        # chip: unroll=4 was NOT faster (7.2 vs 6.2 ms at needed=200) — the
        # steps are bound by their [B, C] math, not loop overhead — so the
        # default stays 1; the knob remains for other shapes. Overshooting
        # n_steps by <unroll only assigns ranks callers never consult (the
        # `needed` contract above).
        i0, ranks, min_d = carry
        for u in range(unroll):
            i = i0 + u
            nxt = jnp.argmax(min_d, axis=1)             # [B]
            has = jnp.take_along_axis(min_d, nxt[:, None], axis=1)[:, 0] > -INF
            is_nxt = col == nxt[:, None]
            ranks = jnp.where(is_nxt & has[:, None], i, ranks)
            new_min = jnp.where(is_nxt, -INF,
                                jnp.minimum(min_d, jnp.where(occ, seed_d2(
                                    table_xyz[rows, nxt]), -INF)))
            min_d = jnp.where(has[:, None], new_min, min_d)
        return i0 + unroll, ranks, min_d

    _, bin_ranks, _ = jax.lax.while_loop(
        cond, step, (jnp.asarray(1, jnp.int32), ranks, min_d))

    flat_rank = jnp.full((p + 1,), max_rank, jnp.int32).at[src_index.reshape(-1)].set(
        bin_ranks.reshape(-1))[:p]
    return jnp.where(member, flat_rank, max_rank), counts


@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling(xyz: jnp.ndarray, valid: jnp.ndarray, key: jnp.ndarray,
                            num_samples: int):
    """Exact greedy FPS (farthestPointSampling, common.cpp:19-85) with a keyed
    random first pick. Returns idx [num_samples] i32. O(num_samples * N)."""
    p = xyz.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    first = jax.random.randint(key, (), 0, jnp.maximum(n_valid, 1))
    # Map "first among valid" to a flat index.
    order = jnp.argsort(~valid, stable=True)
    first_idx = order[jnp.clip(first, 0, p - 1)]

    d0 = jnp.linalg.norm(xyz - xyz[first_idx], axis=-1)
    min_d = jnp.where(valid, d0, -INF)
    picked = jnp.zeros((num_samples,), jnp.int32).at[0].set(first_idx.astype(jnp.int32))
    min_d = min_d.at[first_idx].set(-INF)

    def body(i, carry):
        picked, min_d = carry
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        picked = picked.at[i].set(nxt)
        d = jnp.linalg.norm(xyz - xyz[nxt], axis=-1)
        min_d = jnp.minimum(min_d, jnp.where(valid, d, -INF))
        min_d = min_d.at[nxt].set(-INF)
        return picked, min_d

    picked, _ = jax.lax.fori_loop(1, num_samples, body, (picked, min_d))
    return picked
