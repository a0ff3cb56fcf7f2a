"""Pipeline drivers: the TPU-native equivalents of the reference's two ROS
nodes (`scan_registration` front-end and `laser_odometry` back-end), fused into
one process with jit-compiled per-config pipelines."""
from plo_tpu.models.pipeline import FrontEnd, FrontEndOutput  # noqa: F401
from plo_tpu.models.odometry import Odometry, OdometryFrame  # noqa: F401
