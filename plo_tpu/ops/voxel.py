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

_P1, _P2, _P3 = 73856093, 19349663, 83492791


@partial(jax.jit, static_argnames=("out_size", "n_buckets"))
def voxel_downsample(cloud: PointCloud, leaf_size, out_size: int,
                     n_buckets: int = 1 << 18) -> PointCloud:
    """Centroid-per-voxel downsample into a fixed-capacity cloud.

    Voxels are identified by spatial hash (collisions merge distinct voxels —
    vanishingly rare at n_buckets >> occupied voxels and harmless for a
    decimation op). Voxels beyond `out_size` (by bucket order) are dropped.
    """
    cell = jnp.floor(cloud.xyz / leaf_size).astype(jnp.int32)
    h = (cell[:, 0] * _P1) ^ (cell[:, 1] * _P2) ^ (cell[:, 2] * _P3)
    bucket = jnp.where(cloud.valid, jnp.abs(h) % n_buckets, n_buckets)

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
