import numpy as np
import jax, jax.numpy as jnp
import sys, dataclasses as dc; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime
from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models.pipeline import FrontEnd
from plo_tpu.models.odometry import _make_icp_step
from plo_tpu.ops import matching

world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = synthetic.synthetic_sequence(3, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)
cfg = cfgmod.Config(
    scan_registration=cfgmod.ScanRegistrationConfig(
        compute_normal_method=cfgmod.ComputeNormalConfig(format="range_image", method="pca"),
        presample_method=cfgmod.PresampleConfig(method="geometric_features"),
        sample_method=cfgmod.SampleConfig(method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
    ),
    laser_odometry=cfgmod.LaserOdometryConfig(
        matching_method=cfgmod.MatchingConfig(method="IMLS"),
        solve_method=cfgmod.SolveConfig(method="RANSAC", iterations=30,
            ransac=cfgmod.RANSACConfig(max_iterations=1000, distance_threshold=0.2,
                                       final_solve_method="DRPM")),
    ),
    sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4),
)
fe = FrontEnd(cfg, capacity=65536)
a = fe.process(scans[0], jax.random.PRNGKey(0), None, first_frame=False)
b = fe.process(scans[1], jax.random.PRNGKey(1), None, first_frame=False)
tgt, flat = a.filtered, b.flat
jax.block_until_ready((tgt, flat))
imls_cfg = cfg.laser_odometry.matching_method.imls
key = jax.random.PRNGKey(0)

def chain(x, s): return x + s * 1e-20
def body_m(args):
    fx, acc = args
    res = matching.imls_project(dc.replace(flat, xyz=fx), tgt, imls_cfg, tgt.normal, tgt.valid)
    s = res.y.sum()
    return (chain(fx, s), acc + s)
print(f"imls_project: {devtime(body_m, (flat.xyz, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

icp = _make_icp_step(cfg, jit=False)
def body_i(args):
    fx, acc = args
    rpose, i, nc, conv = icp(dc.replace(flat, xyz=fx), tgt, key, None)
    s = rpose.sum()
    return (chain(fx, s), acc + s)
print(f"icp_step full: {devtime(body_i, (flat.xyz, jnp.zeros(())), fetch=lambda a: a[1], n_small=2, n_big=6):.2f} ms")
