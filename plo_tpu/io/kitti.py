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


def read_calib_tr(path: str) -> np.ndarray:
    """Read the velodyne->cam0 extrinsic `Tr` from a KITTI sequence calib.txt
    as a 4x4. Ground-truth poses live in the cam0 frame; odometry estimated in
    the velodyne frame compares via T_velo = Tr^-1 . T_cam . Tr."""
    with open(path) as f:
        for line in f:
            if line.startswith("Tr"):
                vals = np.fromstring(line.split(":", 1)[1], sep=" ")
                tr = np.eye(4)
                tr[:3, :4] = vals.reshape(3, 4)
                return tr
    raise ValueError(f"no 'Tr' line in {path}")


def poses_to_velodyne_frame(poses_cam: np.ndarray, tr: np.ndarray) -> np.ndarray:
    """Conjugate cam0-frame GT poses into the velodyne frame."""
    tr_inv = np.linalg.inv(tr)
    return np.einsum("ij,njk,kl->nil", tr_inv, poses_cam, tr)


def kitti_scan_iterator(
    root: str, sequence: str = "00", start: int = 0, count: Optional[int] = None,
    capacity: Optional[int] = None,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_index, [N, 4] points) for a KITTI sequence.

    With `capacity`, scans stream through the native threaded prefetcher
    (plo_tpu/native: the next .bin is read + padded on a C++ thread while the
    current scan is on-device), yielding zero-padded [capacity, 4] arrays."""
    vdir = os.path.join(root, "sequences", sequence, "velodyne")
    files = sorted(f for f in os.listdir(vdir) if f.endswith(".bin"))
    if count is not None:
        files = files[start : start + count]
    else:
        files = files[start:]
    if capacity is not None:
        from plo_tpu import native

        paths = [os.path.join(vdir, f) for f in files]
        idxs = [int(os.path.splitext(f)[0]) for f in files]
        for idx, (scan, n) in zip(idxs, native.ScanPrefetcher(paths, capacity)):
            yield idx, scan[:n]
        return
    for f in files:
        idx = int(os.path.splitext(f)[0])
        yield idx, read_velodyne_bin(os.path.join(vdir, f))
