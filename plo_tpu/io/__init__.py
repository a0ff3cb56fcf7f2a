"""Scan input: KITTI velodyne binaries and a synthetic LiDAR simulator.

Replaces the reference's rosbag + `/velodyne_points` subscription
(scan_registration.cpp:1592) with an offline iterator of raw point arrays.
"""
from plo_tpu.io.kitti import read_velodyne_bin, kitti_scan_iterator  # noqa: F401
from plo_tpu.io.synthetic import SyntheticWorld, synthetic_sequence  # noqa: F401
