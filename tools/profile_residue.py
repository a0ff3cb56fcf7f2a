"""Where do the 4.9 ms/scan of the grid16 batch step go? Time the pieces:
front-end only, ICP only, window update, full step."""
import time
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime
from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.models.odometry import _cached_frontend, _make_icp_step

cfg = cfgmod.Config(
    scan_registration=cfgmod.ScanRegistrationConfig(
        compute_normal_method=cfgmod.ComputeNormalConfig(format="range_image", method="pca"),
        presample_method=cfgmod.PresampleConfig(method="geometric_features"),
        sample_method=cfgmod.SampleConfig(method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
    ),
    laser_odometry=cfgmod.LaserOdometryConfig(
        refresh_correspondences=False,
        matching_method=cfgmod.MatchingConfig(method="IMLS"),
        solve_method=cfgmod.SolveConfig(method="RANSAC", iterations=30,
            ransac=cfgmod.RANSACConfig(max_iterations=1000, distance_threshold=0.2,
                                       final_solve_method="DRPM")),
    ),
    sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4),
)
CAP = 57600
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = synthetic.synthetic_sequence(4, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)
odo = Odometry(cfg, capacity=CAP, seed=0, transfer="grid16")
for s in scans[:3]:
    odo.process_scan(s)
fe_grid = odo.frontend.raw_grid_fn
icp = _make_icp_step(cfg)
grid = jnp.asarray(odo._pack_grid(scans[3]))
key = jax.random.PRNGKey(1)
last = odo.last_filtered
target = odo._accumulated_target()
fe_out = jax.jit(lambda g, k: fe_grid(g, k, last.xyz, last.valid, first_frame=False))(grid, key)
jax.block_until_ready(fe_out.flat.xyz)
prior = odo._last_rel

def t_fe(args):
    g, acc = args
    out = fe_grid(g, key, last.xyz, last.valid, first_frame=False)
    s = out.flat.xyz.sum() * 1e-9
    return (g, acc + s)
print(f"front-end (grid16): {devtime(t_fe, (grid, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms", flush=True)

def t_icp(args):
    fl, acc = args
    rpose, i, nc, cv = icp(fl, target, key, prior)
    s = rpose.sum() * 1e-9
    import dataclasses as dc
    return (dc.replace(fl, xyz=fl.xyz + s * 1e-20), acc + s)
print(f"icp step (freeze, prior): {devtime(t_icp, (fe_out.flat, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms", flush=True)

# window update (concat shift for K=1) + stats pack
def t_win(args):
    fl, acc = args
    w = jax.tree_util.tree_map(lambda a: a[None], fe_out.filtered)
    nw = jax.tree_util.tree_map(lambda a, n: jnp.concatenate([a[1:], n[None]], 0), w, fe_out.filtered)
    s = nw.xyz.sum() * 1e-12
    import dataclasses as dc
    return (dc.replace(fl, xyz=fl.xyz + s * 1e-20), acc + s)
print(f"window shift: {devtime(t_win, (fe_out.flat, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms", flush=True)
