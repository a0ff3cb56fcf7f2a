"""plo_tpu — TPU-native planetary LiDAR odometry engine.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the C++/ROS
reference `spirit-man/Planetary-LiDAR-Odometry` (five-stage modular scan
registration: preprocess -> normals -> pre-sample -> sample -> match+solve).

Design pillars (TPU-first, not a port):
  * Dense range-image grid `[H_rings, W_azimuth]` + occupancy mask replaces the
    reference's per-ring `std::vector` clouds; ring windows and cross-ring
    nearest-neighbor lookups become stencil ops / windowed gathers.
  * Fixed-capacity masked point sets replace erase-in-place PCL clouds: the
    reference's pervasive `cloud->erase(it)` cascades become `valid &= ...`.
  * kd-trees (FLANN / libnabo) are replaced by exact chunked brute-force KNN
    expressed as tiled distance matmuls, and by a grid-hash neighbor kernel.
  * The 6-DoF point-to-plane solves are dense on-device reductions
    (A^T A / A^T b) ready for `psum` over a device mesh.

Subpackage map (reference parity notes in each module's docstring):
  ops/       front-end + matching kernels        (scan_registration.cpp, imls_icp.cpp)
  solvers/   motion-estimation solvers           (solver.cpp, degeneracy.h)
  models/    pipeline + odometry drivers         (the two ROS nodes)
  parallel/  mesh sharding, collectives, BA      (new; BASELINE.json north star)
  io/        KITTI reader + synthetic LiDAR      (replaces rosbag input)
  utils/     profiling, saving, evaluation       (tic_toc.h, saver.cpp)
"""

import os as _os

import jax as _jax

# Geometry code is precision-sensitive: TPU matmuls default to bf16 inputs,
# which is far too coarse for pose solves / rotation algebra. Force f32
# accumulation everywhere; hot kernels opt into bf16 explicitly where safe.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the fused per-config pipelines are large
# programs, and on remote-compile setups (TPU tunnels) a cold compile takes
# minutes. Cache across processes so only the first run pays it.
_cache_dir = _os.environ.get("PLO_TPU_COMPILE_CACHE",
                             _os.path.expanduser("~/.cache/plo_tpu_jax"))
# CPU AOT cache entries are machine-feature-sensitive (noisy SIGILL warnings
# on reload); only cache for accelerator platforms.
if "cpu" in _os.environ.get("JAX_PLATFORMS", ""):
    _cache_dir = None
if _cache_dir and _cache_dir != "0":
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plo_tpu import config as config  # noqa: F401
from plo_tpu.cloud import PointCloud, ScanGrid  # noqa: F401

__version__ = "0.1.0"
