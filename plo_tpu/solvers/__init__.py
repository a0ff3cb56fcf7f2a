"""Motion-estimation solvers (solver.cpp, degeneracy.h) as on-device kernels.

All solvers consume masked correspondence sets (source, ref, ref_normal,
valid) and return a 4x4 delta transform. The shared [N, 6] point-to-plane
system builder lives in `build.py`; its A^T A / A^T b reductions are the
collective-friendly seam for multi-chip sharding (parallel/).
"""
from plo_tpu.solvers.build import build_system, masked_lstsq, se3_from_x  # noqa: F401
from plo_tpu.solvers.ls import solve_ls_trimmed, solve_weighted_ls  # noqa: F401
from plo_tpu.solvers.gauss_newton import solve_gauss_newton  # noqa: F401
from plo_tpu.solvers.ransac import solve_ransac  # noqa: F401
from plo_tpu.solvers.drpm import solve_drpm  # noqa: F401
from plo_tpu.solvers.icp_umeyama import solve_icp_point_to_point, umeyama  # noqa: F401
from plo_tpu.solvers.gnc import solve_gnc_tls  # noqa: F401
