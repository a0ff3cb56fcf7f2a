"""Core point-set containers: fixed-capacity masked clouds and range-image grids.

The reference stores scans as `pcl::PointCloud<pcl::PointXYZINormal>` with
erase-in-place filtering (e.g. imls_icp.cpp:592,614). On TPU every shape must be
static, so a cloud is a padded struct-of-arrays with a validity mask; "deleting"
a point clears its mask bit. This preserves the reference's filter-cascade
semantics while staying jit-able.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Padded point set (struct of arrays), capacity P.

    Mirrors pcl::PointXYZINormal (common.h:17): xyz, intensity, normal,
    curvature — plus the PCA eigen-data the reference carries in side matrices
    (scan_registration.cpp:1202-1207) and the validity mask.
    """

    xyz: jnp.ndarray        # [P, 3] f32
    normal: jnp.ndarray     # [P, 3] f32 (0 where unknown)
    intensity: jnp.ndarray  # [P]    f32 (scanID + 0.1 * relTime, scan_registration.cpp:1042)
    curvature: jnp.ndarray  # [P]    f32
    eigvals: jnp.ndarray    # [P, 3] f32, descending (lambda1 >= lambda2 >= lambda3)
    valid: jnp.ndarray      # [P]    bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def zeros(capacity: int) -> "PointCloud":
        return PointCloud(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            normal=jnp.zeros((capacity, 3), jnp.float32),
            intensity=jnp.zeros((capacity,), jnp.float32),
            curvature=jnp.zeros((capacity,), jnp.float32),
            eigvals=jnp.zeros((capacity, 3), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )

    @staticmethod
    def from_xyz(xyz: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "PointCloud":
        p = xyz.shape[0]
        if valid is None:
            valid = jnp.ones((p,), bool)
        return PointCloud(
            xyz=xyz.astype(jnp.float32),
            normal=jnp.zeros((p, 3), jnp.float32),
            intensity=jnp.zeros((p,), jnp.float32),
            curvature=jnp.zeros((p,), jnp.float32),
            eigvals=jnp.zeros((p, 3), jnp.float32),
            valid=valid,
        )

    def mask(self, keep: jnp.ndarray) -> "PointCloud":
        """The TPU analog of `cloud->erase(it)`: drop points where keep=False."""
        return dataclasses.replace(self, valid=self.valid & keep)

    def gather(self, idx: jnp.ndarray, idx_valid: jnp.ndarray) -> "PointCloud":
        """Select rows `idx` (with validity) into a new padded cloud."""
        take = lambda a: jnp.take(a, idx, axis=0, mode="clip")
        # Bool gathers hit a pathologically slow TPU path; route via f32
        # (see ops.neighbors.gather_mask).
        valid_f = jnp.take(self.valid.astype(jnp.float32), idx, axis=0, mode="clip")
        return PointCloud(
            xyz=take(self.xyz),
            normal=take(self.normal),
            intensity=take(self.intensity),
            curvature=take(self.curvature),
            eigvals=take(self.eigvals),
            valid=(valid_f > 0.5) & idx_valid,
        )

    def bounding_box(self):
        """Masked axis-aligned bounding box (computeBoundingBox,
        common.h:104-122). Returns (min_pt [3], max_pt [3]); +inf/-inf when
        the cloud is empty (the reference leaves max-double sentinels)."""
        big = jnp.inf
        v = self.valid[:, None]
        mn = jnp.min(jnp.where(v, self.xyz, big), axis=0)
        mx = jnp.max(jnp.where(v, self.xyz, -big), axis=0)
        return mn, mx

    def concat(self, other: "PointCloud") -> "PointCloud":
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        return PointCloud(
            xyz=cat(self.xyz, other.xyz),
            normal=cat(self.normal, other.normal),
            intensity=cat(self.intensity, other.intensity),
            curvature=cat(self.curvature, other.curvature),
            eigvals=cat(self.eigvals, other.eigvals),
            valid=cat(self.valid, other.valid),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScanGrid:
    """Dense range-image layout of one scan: rows = rings, cols = azimuth bins.

    This is the TPU-native replacement for the reference's
    `std::vector<pcl::PointCloud<PointType>> laserCloudScans`
    (scan_registration.cpp:918) *and* its `Eigen::MatrixXf range_image`
    (scan_registration.cpp:934): one structure serves both the "pointcloud" and
    "range_image" data formats. Ring-window loops become row stencils; the
    per-ring kd-tree lookup onto adjacent rings (scan_registration.cpp:117-136)
    becomes a windowed gather in the column dimension.
    """

    xyz: jnp.ndarray       # [H, W, 3] f32 — 0 where unoccupied
    rng: jnp.ndarray       # [H, W]    f32 — 3D range; +inf where unoccupied
    rel_time: jnp.ndarray  # [H, W]    f32 — relative time in scan (0..1)
    occupied: jnp.ndarray  # [H, W]    bool

    @property
    def height(self) -> int:
        return self.xyz.shape[0]

    @property
    def width(self) -> int:
        return self.xyz.shape[1]

    def flatten_cloud(self) -> PointCloud:
        """Row-major flatten to a padded PointCloud (ring-major point order,
        matching the reference's laserCloud concatenation order,
        scan_registration.cpp:1064-1069)."""
        h, w = self.rng.shape
        cloud = PointCloud.from_xyz(self.xyz.reshape(h * w, 3), self.occupied.reshape(h * w))
        ring = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
        intensity = ring + 0.1 * self.rel_time.reshape(h * w)
        return dataclasses.replace(cloud, intensity=intensity)
