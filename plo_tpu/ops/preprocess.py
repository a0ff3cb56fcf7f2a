"""Stage 1 — preprocessing: range gating, ring assignment, relative time,
ring-sorted compaction, and range-image rasterization.

Reference behavior reproduced (scan_registration.cpp:847-1113):
  * NaN removal + min/max 3D-range gate (removeClosedPointCloud, :87-115).
  * Ring (scanID) assignment: VLP-16 formula, VLP-32C nearest-angle table,
    HDL-64 piecewise formula with ring>50 outlier discard (:948-1003).
  * Azimuth -> relative scan time with the sequential `halfPassed` state
    machine (:1011-1041), vectorized here as a cumulative-or over points.
  * intensity = scanID + 0.1 * relTime (:1042).
  * Optional range-image fill with per-cell min of the *2D* range
    sqrt(x^2+y^2) (:943, :1045-1057) — note the reference's range image stores
    horizontal range, a quirk kept for FALS/SRI parity.
  * Per-ring curvature over a +-window of consecutive stored points
    (:1071-1113) lives in ops/features.py on the compacted layout.

TPU-native layout: instead of `vector<pcl::PointCloud>` per ring, points are
stable-sorted by ring (arrival order preserved within a ring — identical point
order to the reference's per-ring concatenation, :1064-1069) into one padded
array with per-ring start/count tables. All later ring-window ops become
constant-offset gathers.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plo_tpu.config import SensorConfig

# VLP-32C elevation table — 27 entries for 32 rings, a reference quirk kept
# verbatim (scan_registration.cpp:960-964). numpy (not jnp): a module-level
# device constant would initialize the XLA backend at import time, breaking
# jax.distributed.initialize() (parallel/distributed.py).
VLP32C_ANGLES = np.array(
    [-25.000, -15.639, -11.310, -8.843, -7.254, -6.148, -5.333, -4.667, -4.000,
     -3.667, -3.333, -3.000, -2.667, -2.333, -2.000, -1.667, -1.333, -1.000,
     -0.667, -0.333, 0.000, 0.333, 0.667, 1.000, 1.333, 1.667, 2.333],
    dtype=np.float32,
)


def ring_elevation_table(n_scans: int) -> np.ndarray:
    """Ring/row index -> beam elevation (degrees) of the ring model every
    binning path uses (`assign_rings`, native rasterize_grid16 and its numpy
    fallback) — THE single source of truth for grid16 xyz reconstruction
    (models/pipeline.py::_grid_dirs must invert exactly the model the
    rasterizer binned with, or reconstructed elevations are wrong).

    16: -15 + 2k (the VLP-16 formula inverse, scan_registration.cpp:948-958);
    32: the reference's 27-entry VLP-32C quirk table
        (scan_registration.cpp:960-964) padded to 32 rows — rings 27..31 are
        NEVER produced by ring assignment (argmin over 27 entries), so those
        grid16 rows stay empty; the pad values only keep the array shape;
    64: the HDL-64 piecewise formula inverse (scan_registration.cpp:990-1003);
        rings 51..63 are discarded as outliers and stay empty.
    """
    if n_scans == 16:
        return (-15.0 + 2.0 * np.arange(16)).astype(np.float32)
    if n_scans == 32:
        pad = VLP32C_ANGLES[-1] + 0.333 * (1 + np.arange(32 - len(VLP32C_ANGLES)))
        return np.concatenate([VLP32C_ANGLES, pad.astype(np.float32)])
    if n_scans == 64:
        upper = 2.0 - np.arange(32) / 3.0
        lower = -8.83 - np.arange(32) / 2.0
        return np.concatenate([upper, lower]).astype(np.float32)
    raise ValueError(f"unsupported n_scans {n_scans}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RingCloud:
    """Ring-sorted compact scan: the TPU analog of the reference's
    `laserCloud` + scanStartInd/scanEndInd (scan_registration.cpp:1063-1069)."""

    xyz: jnp.ndarray         # [P, 3] f32
    ring: jnp.ndarray        # [P] i32 (== n_scans for padding slots)
    rel_time: jnp.ndarray    # [P] f32
    intensity: jnp.ndarray   # [P] f32 = ring + 0.1 * rel_time
    valid: jnp.ndarray       # [P] bool
    ring_start: jnp.ndarray  # [n_scans] i32 — first flat index of each ring
    ring_count: jnp.ndarray  # [n_scans] i32
    pos_in_ring: jnp.ndarray  # [P] i32 — index within own ring

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


def assign_rings(xyz: jnp.ndarray, valid: jnp.ndarray, n_scans: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized scanID assignment (scan_registration.cpp:948-1003).

    Returns (ring [P] i32, valid [P] bool with out-of-fan points dropped).
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    rng2d = jnp.sqrt(x * x + y * y)
    angle = jnp.degrees(jnp.arctan2(z, jnp.maximum(rng2d, 1e-12)))

    if n_scans == 16:
        ring = jnp.floor((angle + 15.0) / 2.0 + 0.5).astype(jnp.int32)
        ok = (ring >= 0) & (ring < n_scans)
    elif n_scans == 32:
        diff = jnp.abs(angle[..., None] - VLP32C_ANGLES[None, :])
        ring = jnp.argmin(diff, axis=-1).astype(jnp.int32)
        ok = (ring >= 0) & (ring < n_scans)
    elif n_scans == 64:
        upper_bound, lower_bound = 2.0, -24.33
        ring_hi = jnp.floor((upper_bound - angle) * 3.0 + 0.5).astype(jnp.int32)
        ring_lo = n_scans // 2 + jnp.floor((-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32)
        ring = jnp.where(angle >= -8.83, ring_hi, ring_lo)
        # use [0, 50]; >50 removed as outliers (scan_registration.cpp:997-1002)
        ok = (angle <= upper_bound) & (angle >= lower_bound) & (ring <= 50) & (ring >= 0)
    else:
        raise ValueError("only 16/32/64 scan lines supported (scan_registration.cpp:1585)")

    ring = jnp.clip(ring, 0, n_scans - 1)
    return ring, valid & ok


def relative_times(xyz: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Azimuth -> relTime in [0, 1], replicating the sequential halfPassed
    logic (scan_registration.cpp:899-1041) with a cumulative-or.

    startOri/endOri come from the first/last *valid* points (the reference uses
    raw indices 0 and N-1 of the already range-gated cloud).
    """
    p = xyz.shape[0]
    ori_raw = -jnp.arctan2(xyz[:, 1], xyz[:, 0])

    idx = jnp.arange(p)
    first = jnp.argmax(valid)  # first True
    last = p - 1 - jnp.argmax(valid[::-1])
    start_ori = ori_raw[first]
    end_ori = ori_raw[last] + 2.0 * jnp.pi
    span = end_ori - start_ori
    end_ori = jnp.where(span > 3.0 * jnp.pi, end_ori - 2.0 * jnp.pi,
                        jnp.where(span < jnp.pi, end_ori + 2.0 * jnp.pi, end_ori))

    # Pre-halfPassed adjustment of each point's ori.
    ori_pre = ori_raw
    ori_pre = jnp.where(ori_pre < start_ori - jnp.pi / 2, ori_pre + 2 * jnp.pi, ori_pre)
    ori_pre = jnp.where(ori_pre > start_ori + jnp.pi * 3 / 2, ori_pre - 2 * jnp.pi, ori_pre)

    # halfPassed flips once ori - startOri > pi for some earlier point; it is a
    # monotone latch -> cumulative max of the trigger indicator. The trigger is
    # evaluated with the pre-adjusted ori (only for valid points).
    trigger = (ori_pre - start_ori > jnp.pi) & valid
    half_passed_after = jnp.cumsum(trigger.astype(jnp.int32)) > 0
    # The reference checks halfPassed *before* updating it, so point i uses the
    # latch state from points < i as well as its own trigger (the flag is set
    # inside the same iteration only after the branch). Reading the code
    # (:1012-1027): the branch taken depends on halfPassed from previous
    # points; the trigger updates it for *later* points.
    half_passed = jnp.concatenate([jnp.zeros((1,), bool), half_passed_after[:-1]])

    ori_post = ori_raw + 2.0 * jnp.pi
    ori_post = jnp.where(ori_post < end_ori - jnp.pi * 3 / 2, ori_post + 2 * jnp.pi, ori_post)
    ori_post = jnp.where(ori_post > end_ori + jnp.pi / 2, ori_post - 2 * jnp.pi, ori_post)

    ori = jnp.where(half_passed, ori_post, ori_pre)
    return (ori - start_ori) / jnp.maximum(end_ori - start_ori, 1e-9)


@partial(jax.jit, static_argnames=("n_scans", "min_range", "max_range", "sort"))
def _preprocess_impl(pts: jnp.ndarray, n_valid: jnp.ndarray, n_scans: int,
                     min_range: float, max_range: float, sort: bool = True) -> RingCloud:
    p = pts.shape[0]
    xyz = pts[:, :3]
    in_cap = jnp.arange(p) < n_valid

    # NaN removal + 3D range gate (scan_registration.cpp:860-863, :101-102).
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    xyz = jnp.where(finite[:, None], xyz, 0.0)
    d2 = jnp.sum(xyz * xyz, axis=-1)
    valid = in_cap & finite & (d2 >= min_range**2) & (d2 <= max_range**2)

    ring, valid = assign_rings(xyz, valid, n_scans)
    rel_time = relative_times(xyz, valid)
    rel_time = jnp.where(valid, rel_time, 0.0)

    ring_u = jnp.where(valid, ring, n_scans)
    if sort:
        # Stable COUNTING sort by ring (padding slots -> ring n_scans, sorted
        # last); within a ring, arrival order is preserved — identical to the
        # reference's per-ring push_back + concatenation order. The key space
        # is tiny (n_scans+1), so rank-within-ring is one [n_scans+1, P]
        # cumsum and the reorder is ONE packed scatter to a permutation of
        # [0, P) — ~5x cheaper than the general argsort + per-array gathers
        # it replaces (TPU comparison sorts and gathers are the slow path).
        h1 = n_scans + 1
        onehot = (jnp.arange(h1, dtype=jnp.int32)[:, None] == ring_u[None, :])
        csum = jnp.cumsum(onehot.astype(jnp.int32), axis=1)     # [h1, P]
        pos = jnp.take_along_axis(
            csum, ring_u[None, :].astype(jnp.int32), axis=0)[0] - 1  # [P]
        counts_full = csum[:, -1]                               # [h1]
        starts_full = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_full)[:-1]])
        dest = starts_full[ring_u] + pos   # a permutation of [0, P)
        payload = jnp.concatenate(
            [xyz, rel_time[:, None], ring_u[:, None].astype(jnp.float32),
             valid[:, None].astype(jnp.float32),
             pos[:, None].astype(jnp.float32)], axis=1)
        packed = jnp.zeros((p, 7), jnp.float32).at[dest].set(payload)
        xyz_s = packed[:, :3]
        rel_s = packed[:, 3]
        ring_s = packed[:, 4].astype(jnp.int32)
        valid_s = packed[:, 5] > 0.5
        pos_sorted = packed[:, 6].astype(jnp.int32)
    else:
        # Arrival-order layout: consumers that only rasterize (the range-image
        # paths) never index by ring position, so the 65k argsort + gathers
        # are skipped. pos_in_ring is NOT meaningful in this layout.
        xyz_s, ring_s, rel_s, valid_s = xyz, ring_u, rel_time, valid

    ring_count = jnp.bincount(ring_u, length=n_scans + 1)[:n_scans]
    ring_start = jnp.concatenate([jnp.zeros((1,), ring_count.dtype), jnp.cumsum(ring_count)[:-1]])
    if sort:
        pos_in_ring = pos_sorted
    else:
        pos_in_ring = jnp.zeros((p,), jnp.int32)

    intensity = ring_s.astype(jnp.float32) + 0.1 * rel_s
    return RingCloud(
        xyz=xyz_s,
        ring=ring_s.astype(jnp.int32),
        rel_time=rel_s,
        intensity=jnp.where(valid_s, intensity, 0.0),
        valid=valid_s,
        ring_start=ring_start.astype(jnp.int32),
        ring_count=ring_count.astype(jnp.int32),
        pos_in_ring=pos_in_ring.astype(jnp.int32),
    )


def preprocess(pts: jnp.ndarray, n_valid, sensor: SensorConfig, sort: bool = True) -> RingCloud:
    """Full stage-1 preprocessing of one padded raw scan [P, >=3].

    sort=False skips the ring-sorted compaction (valid only for consumers
    that never use ring positions, i.e. the range-image rasterizer)."""
    return _preprocess_impl(
        pts, jnp.asarray(n_valid, jnp.int32), sensor.n_scans,
        float(sensor.minimum_range), float(sensor.maximum_range), sort
    )


@partial(jax.jit, static_argnames=("height", "width"))
def rasterize_range_image(cloud: RingCloud, height: int, width: int):
    """Scatter-min fill of the dense range image (scan_registration.cpp:1045-1057).

    Returns (rng2d [H, W] with +inf holes, xyz [H, W, 3] of the min-range point
    per cell, rel_time [H, W], occupied [H, W], src_idx [H, W] flat index of
    the winning point in `cloud` — for carrying per-point attributes like the
    stage-1 curvature into the grid). col = floor(relTime * width) clipped;
    the stored value is the reference's 2D range sqrt(x^2+y^2).
    """
    col = jnp.clip((cloud.rel_time * width).astype(jnp.int32), 0, width - 1)
    row = jnp.clip(cloud.ring, 0, height - 1)
    cell = jnp.where(cloud.valid, row * width + col, height * width)

    rng2d = jnp.sqrt(cloud.xyz[:, 0] ** 2 + cloud.xyz[:, 1] ** 2)
    flat = jnp.full((height * width + 1,), jnp.inf, jnp.float32).at[cell].min(
        jnp.where(cloud.valid, rng2d, jnp.inf)
    )
    # Winner-takes-cell: points matching the cell min write one packed
    # [x, y, z, rel_time, src_idx] row — a single scatter instead of three
    # (scatters are the expensive op here; packing halved the rasterizer).
    is_winner = cloud.valid & (rng2d <= flat[cell])
    wcell = jnp.where(is_winner, cell, height * width)
    payload = jnp.concatenate(
        [cloud.xyz, cloud.rel_time[:, None],
         jnp.arange(cloud.capacity, dtype=jnp.float32)[:, None]], axis=1)
    packed = jnp.zeros((height * width + 1, 5), jnp.float32).at[wcell].set(payload)

    rng_img = flat[:-1].reshape(height, width)
    occupied = jnp.isfinite(rng_img)
    return (rng_img, packed[:-1, :3].reshape(height, width, 3),
            packed[:-1, 3].reshape(height, width), occupied,
            packed[:-1, 4].astype(jnp.int32).reshape(height, width))
