"""30-frame curved-run ATE for a given front-end config (validates bench-config switches)."""
import sys, time
import numpy as np
import jax
from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.utils import evaluate

fmt = sys.argv[1] if len(sys.argv) > 1 else "range_image"
method = sys.argv[2] if len(sys.argv) > 2 else "pca"
az_res = 0.4

cfg = cfgmod.Config(
    scan_registration=cfgmod.ScanRegistrationConfig(
        compute_normal_method=cfgmod.ComputeNormalConfig(format=fmt, method=method),
        presample_method=cfgmod.PresampleConfig(method="geometric_features"),
        sample_method=cfgmod.SampleConfig(method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
    ),
    laser_odometry=cfgmod.LaserOdometryConfig(
        matching_method=cfgmod.MatchingConfig(method="IMLS"),
        solve_method=cfgmod.SolveConfig(method="RANSAC", iterations=30,
            ransac=cfgmod.RANSACConfig(max_iterations=1000, distance_threshold=0.2,
                                       final_solve_method="DRPM")),
    ),
    sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=az_res),
)
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
speed = np.concatenate([np.linspace(0.0, 0.9, 4), np.full(26, 0.9)])
scans, gt = synthetic.synthetic_sequence(30, n_scans=64, azimuth_steps=900,
                                         speed=speed, yaw_rate=0.02, seed=3, world=world)
odo = Odometry(cfg, capacity=65536, seed=0, async_mode=True)
t0 = time.perf_counter()
odo.process_scans(scans, batch=8)
odo.finalize()
dt = time.perf_counter() - t0
poses = odo.poses()
gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
ate = evaluate.ate_rmse(poses, gtr, align=False)
terr, rerr = evaluate.rpe(poses, gtr)
print(f"{fmt}/{method}: ATE={ate*1000:.1f} mm  RPE_t={terr*1000:.1f} mm  "
      f"RPE_r={rerr:.5f} rad  wall={dt:.1f}s ({len(scans)/dt:.1f} scans/s incl compile)")
