"""Per-point motion compensation ("undistortion").

The reference declares the capability but ships it disabled: DISTORTION 0,
TransformToStart/End calls commented out (laser_odometry.cpp:29,119-124,459),
and its implementation applies one rigid transform to the whole cloud rather
than interpolating by firing time. Here the capability is implemented properly
(and still off by default for parity): each point is moved by the fractional
pose exp(rel_time * log(T_rel)) — constant-velocity motion compensation using
the per-point relative scan time from preprocessing (intensity fraction,
scan_registration.cpp:1042).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from plo_tpu import geometry as geo
from plo_tpu.cloud import PointCloud


@jax.jit
def undistort_cloud(cloud: PointCloud, rel_pose: jnp.ndarray) -> PointCloud:
    """Move each point into the scan-start frame assuming constant velocity
    over the sweep: p' = interp(rel_pose, rel_time_p) @ p.

    rel_time is recovered from the intensity encoding (intensity =
    ring + 0.1 * relTime)."""
    rel_time = jnp.clip((cloud.intensity - jnp.floor(cloud.intensity)) / 0.1, 0.0, 1.0)
    T = geo.interpolate_pose(rel_pose, rel_time)          # [P, 4, 4]
    xyz = jnp.einsum("pij,pj->pi", T[:, :3, :3], cloud.xyz) + T[:, :3, 3]
    return dataclasses.replace(cloud, xyz=jnp.where(cloud.valid[:, None], xyz, cloud.xyz))
