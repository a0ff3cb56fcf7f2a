"""Artifact saver — the reference's results I/O (saver.cpp:28-133), same text
formats so downstream tooling ports 1:1:

  * point clouds: "x y z intensity nx ny nz curvature" per line
    (savePointCloudToTxt)
  * poses: TUM "t x y z qx qy qz qw" appended (savePoseToFile)
  * normal line markers as OBJ v/l records (saveMarkerToFile /
    visualizePCAFeatures: a segment from each point along its normal)
  * matched point pairs: "sx sy sz rx ry rz" (saveMatchedPointsToFile)

All savers accept masked PointClouds and drop invalid rows. Everything is
gated behind SaverConfig.enabled in the drivers (the reference writes
unconditionally every frame, which dominates its runtime).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from plo_tpu.cloud import PointCloud


def _np(cloud: PointCloud):
    v = np.asarray(cloud.valid)
    return (np.asarray(cloud.xyz)[v], np.asarray(cloud.intensity)[v],
            np.asarray(cloud.normal)[v], np.asarray(cloud.curvature)[v])


def save_point_cloud_txt(cloud: PointCloud, path: str):
    xyz, inten, nrm, curv = _np(cloud)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in range(len(xyz)):
            f.write(f"{xyz[i,0]} {xyz[i,1]} {xyz[i,2]} {inten[i]} "
                    f"{nrm[i,0]} {nrm[i,1]} {nrm[i,2]} {curv[i]}\n")


def save_pose_tum(pose: np.ndarray, path: str, timestamp: str):
    """Append one TUM-format pose line (savePoseToFile)."""
    import jax.numpy as jnp
    from plo_tpu import geometry as geo

    q = np.asarray(geo.quat_from_rotation(jnp.asarray(pose[:3, :3])))
    t = pose[:3, 3]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(f"{timestamp} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n")


def save_normal_markers_obj(cloud: PointCloud, path: str, scale: float = 0.1):
    """OBJ line list visualizing normals (visualizePCAFeatures +
    saveMarkerToFile): one segment per valid point."""
    xyz, _, nrm, _ = _np(cloud)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in range(len(xyz)):
            a = xyz[i]
            b = xyz[i] + scale * nrm[i]
            f.write(f"v {a[0]} {a[1]} {a[2]}\n")
            f.write(f"v {b[0]} {b[1]} {b[2]}\n")
        for i in range(len(xyz)):
            f.write(f"l {2*i+1} {2*i+2}\n")


def save_matched_points(src_xyz: np.ndarray, ref_xyz: np.ndarray,
                        valid: Optional[np.ndarray], path: str):
    """Matched pair dump (saveMatchedPointsToFile)."""
    src = np.asarray(src_xyz)
    ref = np.asarray(ref_xyz)
    if valid is not None:
        m = np.asarray(valid)
        src, ref = src[m], ref[m]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for s, r in zip(src, ref):
            f.write(f"{s[0]} {s[1]} {s[2]} {r[0]} {r[1]} {r[2]}\n")


def save_scalar_append(path: str, number: float):
    """saveThresholdFile (saver.cpp:78-86): append one fixed-6 scalar per
    line. Only referenced from a commented-out residual dump in the reference
    (solver.cpp:114); kept for artifact-format parity."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(f"{number:.6f}\n")


def save_descriptors_txt(result, path: str):
    """saveCloudFeaturesAndDescriptors analog: per valid point, xyz followed
    by the 22-dim descriptor column (saver.cpp:309-340 layout)."""
    import numpy as np

    desc = np.asarray(result.descriptors())  # [22, P]
    v = np.asarray(result.cloud.valid)
    xyz = np.asarray(result.cloud.xyz)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in np.nonzero(v)[0]:
            row = " ".join(str(x) for x in desc[:, i])
            f.write(f"{xyz[i,0]} {xyz[i,1]} {xyz[i,2]} {row}\n")
