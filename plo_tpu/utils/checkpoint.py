"""Checkpoint / resume for the odometry engine.

The reference has none (SURVEY.md §5): its whole odometry state is three
globals (prevLaserPose, cloudQueue, frameCount — laser_odometry.cpp:48-57).
Here the same state is an explicit, serializable snapshot: save every K frames
and resume by loading + skipping processed scans. Format: a single .npz (the
state is small — one pose + the model-cloud window), no orbax dependency
needed at this scale.
"""
from __future__ import annotations

import os
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from plo_tpu.cloud import PointCloud

if TYPE_CHECKING:
    from plo_tpu.models.odometry import Odometry


def save(odo: "Odometry", path: str):
    odo._drain()  # flush async frames so prev_pose is current
    odo._sync_queue()  # materialize the device-resident window, if any
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = {
        "prev_pose": odo.prev_pose,
        "frame_count": np.asarray(odo.frame_count),
        "key": np.asarray(odo.key),
        "key_counter": np.asarray(odo._key_counter),
        "n_queue": np.asarray(len(odo.cloud_queue)),
    }
    for qi, cloud in enumerate(odo.cloud_queue):
        for field in ("xyz", "normal", "intensity", "curvature", "eigvals", "valid"):
            state[f"q{qi}_{field}"] = np.asarray(getattr(cloud, field))
    if odo.last_filtered is not None:
        for field in ("xyz", "normal", "intensity", "curvature", "eigvals", "valid"):
            state[f"last_{field}"] = np.asarray(getattr(odo.last_filtered, field))
    if odo._map_mode and odo._device_map is not None:
        for field in ("xyz", "normal", "intensity", "curvature", "eigvals", "valid"):
            state[f"map_{field}"] = np.asarray(getattr(odo._device_map, field))
        state["world_pose"] = np.asarray(odo._world_dev)
        if odo._last_rel is not None:
            state["last_rel"] = np.asarray(odo._last_rel)
    np.savez_compressed(path, **state)


def load(odo: "Odometry", path: str):
    """Restore a snapshot into an Odometry instance built with the same config."""
    data = np.load(path)
    odo.prev_pose = data["prev_pose"]
    odo.frame_count = int(data["frame_count"])
    odo.key = jnp.asarray(data["key"])
    if "key_counter" in data:
        odo._key_counter = int(data["key_counter"])
    odo.cloud_queue.clear()

    def cloud_from(prefix):
        return PointCloud(
            xyz=jnp.asarray(data[f"{prefix}_xyz"]),
            normal=jnp.asarray(data[f"{prefix}_normal"]),
            intensity=jnp.asarray(data[f"{prefix}_intensity"]),
            curvature=jnp.asarray(data[f"{prefix}_curvature"]),
            eigvals=jnp.asarray(data[f"{prefix}_eigvals"]),
            valid=jnp.asarray(data[f"{prefix}_valid"]),
        )

    for qi in range(int(data["n_queue"])):
        odo.cloud_queue.append(cloud_from(f"q{qi}"))
    if "last_xyz" in data:
        odo.last_filtered = cloud_from("last")
    if "map_xyz" in data:
        odo._device_map = cloud_from("map")
        odo._world_dev = jnp.asarray(data["world_pose"])
        if "last_rel" in data:
            odo._last_rel = jnp.asarray(data["last_rel"])
    return odo
