"""KITTI odometry dataset reader (velodyne .bin scans + ground-truth poses).

The reference consumes KITTI through rosbag replay; here scans are read
directly from the odometry benchmark layout:

    <root>/sequences/<seq>/velodyne/NNNNNN.bin   (float32 x,y,z,reflectance)
    <root>/poses/<seq>.txt                        (3x4 row-major cam0 poses)
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np


def read_velodyne_bin(path: str) -> np.ndarray:
    """Load one KITTI velodyne scan as [N, 4] float32 (x, y, z, reflectance)."""
    data = np.fromfile(path, dtype=np.float32)
    return data.reshape(-1, 4)


def read_poses(path: str) -> np.ndarray:
    """Load KITTI ground-truth poses as [N, 4, 4]."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    n = rows.shape[0]
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, :4] = rows
    return poses


def kitti_scan_iterator(
    root: str, sequence: str = "00", start: int = 0, count: Optional[int] = None
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_index, [N, 4] points) for a KITTI sequence."""
    vdir = os.path.join(root, "sequences", sequence, "velodyne")
    files = sorted(f for f in os.listdir(vdir) if f.endswith(".bin"))
    if count is not None:
        files = files[start : start + count]
    else:
        files = files[start:]
    for f in files:
        idx = int(os.path.splitext(f)[0])
        yield idx, read_velodyne_bin(os.path.join(vdir, f))
