"""Voxel-grid downsampling (masked, static-shape).

The reference links PCL's VoxelGrid but ships the call commented out
(scan_registration.cpp:851-858); here it is a first-class op because the
map-scale path depends on it: a voxel-downsampled model bounds per-cell
occupancy, which is exactly what makes the grid-hash neighbor engine
(ops/grid_hash.py) exact-in-practice on large maps.

Semantics match pcl::VoxelGrid: one output point per occupied voxel at the
centroid of its members; normals averaged and renormalized; the output is a
fixed-capacity masked cloud (capacity = out_size).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from plo_tpu.cloud import PointCloud
from plo_tpu.ops.grid_hash import hash_bucket


@partial(jax.jit, static_argnames=("out_size", "n_buckets"))
def voxel_downsample(cloud: PointCloud, leaf_size, out_size: int,
                     n_buckets: int = 1 << 18) -> PointCloud:
    """Centroid-per-voxel downsample into a fixed-capacity cloud.

    Voxels are identified by spatial hash (collisions merge distinct voxels —
    vanishingly rare at n_buckets >> occupied voxels and harmless for a
    decimation op). Voxels beyond `out_size` (by bucket order) are dropped.
    """
    cell = jnp.floor(cloud.xyz / leaf_size).astype(jnp.int32)
    bucket = jnp.where(cloud.valid, hash_bucket(cell, n_buckets), n_buckets)

    ones = cloud.valid.astype(jnp.float32)
    cnt = jnp.zeros((n_buckets + 1,), jnp.float32).at[bucket].add(ones)
    sx = jnp.zeros((n_buckets + 1, 3), jnp.float32).at[bucket].add(
        cloud.xyz * ones[:, None])
    sn = jnp.zeros((n_buckets + 1, 3), jnp.float32).at[bucket].add(
        cloud.normal * ones[:, None])
    si = jnp.zeros((n_buckets + 1,), jnp.float32).at[bucket].add(cloud.intensity * ones)
    sc = jnp.zeros((n_buckets + 1,), jnp.float32).at[bucket].add(cloud.curvature * ones)

    occupied = cnt[:n_buckets] > 0
    # Compact occupied buckets to the fixed output capacity.
    order = jnp.argsort(~occupied, stable=True)[:out_size]
    out_valid = jnp.arange(out_size) < jnp.sum(occupied.astype(jnp.int32))
    denom = jnp.maximum(cnt[order], 1.0)[:, None]

    normal = sn[order] / denom
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = jnp.where(nn > 1e-6, normal / jnp.maximum(nn, 1e-12), 0.0)

    return PointCloud(
        xyz=sx[order] / denom,
        normal=normal,
        intensity=si[order] / denom[:, 0],
        curvature=sc[order] / denom[:, 0],
        eigvals=jnp.zeros((out_size, 3), jnp.float32),
        valid=out_valid,
    )


@partial(jax.jit, static_argnames=("n_buckets",))
def voxel_map_insert(map_cloud: PointCloud, new_cloud: PointCloud, leaf_size,
                     center, n_buckets: int = 1 << 19) -> PointCloud:
    """Insert a (world-frame) cloud into a persistent fixed-capacity voxel map.

    The map-target extension of accumulateTargetCloud
    (laser_odometry.cpp:116-136): instead of a rolling window of whole frames,
    the model is one point per occupied voxel, stable across frames:

      * existing map points are never moved (stable anchors for ICP);
      * a new point enters only if its voxel is unoccupied, first-arrival
        wins within the frame (one scatter-min);
      * when the union exceeds the map capacity, points farthest from
        `center` (the current sensor position) are evicted first.

    Output capacity = map_cloud's capacity. Hash collisions merge voxels
    (vanishingly rare at n_buckets >> occupied voxels; effect = a dropped
    insertion, never a bad point)."""
    cap = map_cloud.capacity
    p = new_cloud.capacity

    def bucket(xyz, valid):
        cell = jnp.floor(xyz / leaf_size).astype(jnp.int32)
        return jnp.where(valid, hash_bucket(cell, n_buckets), n_buckets)

    mb = bucket(map_cloud.xyz, map_cloud.valid)
    occupied = jnp.zeros((n_buckets + 1,), bool).at[mb].set(map_cloud.valid)
    occupied = occupied.at[n_buckets].set(False)

    nb = bucket(new_cloud.xyz, new_cloud.valid)
    # First new point per voxel (scatter-min of the point index).
    idx = jnp.arange(p, dtype=jnp.int32)
    first = jnp.full((n_buckets + 1,), p, jnp.int32).at[nb].min(
        jnp.where(new_cloud.valid, idx, p))
    keep_new = new_cloud.valid & (first[nb] == idx) & ~occupied[nb]

    merged = map_cloud.concat(
        dataclasses.replace(new_cloud, valid=keep_new))
    # Evict farthest-from-center beyond capacity (stable: ties keep the
    # older map points, which sit first in the concat).
    d2 = jnp.sum((merged.xyz - center[None, :]) ** 2, axis=-1)
    d2 = jnp.where(merged.valid, d2, jnp.inf)
    order = jnp.argsort(d2, stable=True)[:cap]
    out = jax.tree_util.tree_map(lambda a: a[order], merged)
    return dataclasses.replace(out, valid=out.valid & jnp.isfinite(d2[order]))
