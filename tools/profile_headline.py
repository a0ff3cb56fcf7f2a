"""Per-stage device timing of the CURRENT headline bench config (range_image
pca front-end + IMLS + RANSAC/DRPM) on the real chip."""
import dataclasses
import time
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime
from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models.pipeline import FrontEnd
from plo_tpu.models.odometry import _make_icp_step
from plo_tpu.ops import matching
from plo_tpu.solvers import solve_ransac, solve_drpm

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
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = synthetic.synthetic_sequence(3, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)
CAP = 65536
key = jax.random.PRNGKey(0)
fe = FrontEnd(cfg, capacity=CAP)

def pack(raw):
    pts = np.zeros((CAP, 4), np.float32); n = min(len(raw), CAP)
    pts[:n, :raw.shape[1]] = raw[:n, :4]
    return jnp.asarray(pts), jnp.asarray(n, jnp.int32)

p0, n0 = pack(scans[0]); p1, n1 = pack(scans[1])
run_fe = fe.raw_fn

# frame 0 to get a target model
fe0 = jax.jit(lambda p, n, k: run_fe(p, n, k, jnp.zeros((1, 3), jnp.float32), None,
                                     jnp.zeros((1,), bool), first_frame=False))
out0 = fe0(p0, n0, key)
jax.block_until_ready(out0.filtered.xyz)
target = out0.filtered

# --- frontend total (chained) ---
def fe_body(args):
    p, acc = args
    o = fe0(p, n1, key)
    s = jnp.sum(jnp.where(o.flat.valid, o.flat.xyz[:, 0], 0))
    return (p + s * 1e-20, acc + s)
print(f"frontend total: {devtime(fe_body, (p1, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

out1 = fe0(p1, n1, key)
flat = out1.flat
jax.block_until_ready(flat.xyz)
imls_cfg = cfg.laser_odometry.matching_method.imls

# --- IMLS match (one pass) ---
def match_body(args):
    x, acc = args
    src = dataclasses.replace(flat, xyz=flat.xyz + x * 1e-20)
    res = matching.imls_project(src, target, imls_cfg, target.normal, target.valid)
    s = jnp.sum(jnp.where(res.valid, res.y[:, 0], 0))
    return (x + s * 1e-20, acc + s)
print(f"IMLS match:     {devtime(match_body, (jnp.zeros(()), jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

res = jax.jit(lambda: matching.imls_project(flat, target, imls_cfg, target.normal, target.valid))()
jax.block_until_ready(res.y)
r = cfg.laser_odometry.solve_method.ransac

# --- RANSAC+DRPM solve (one pass) ---
def solve_body(args):
    x, acc = args
    delta, ok = solve_ransac(flat.xyz + x * 1e-20, res.y, res.normal, res.valid, key,
                             r.max_iterations, r.distance_threshold,
                             r.min_inliers_percentage, r.huber_threshold,
                             "DRPM", r.ls_threshold, r.drpm_threshold,
                             r.drpm_stdev_points, r.drpm_stdev_normals)
    s = jnp.sum(delta[:3, 3])
    return (x + s * 1e-20, acc + s)
print(f"RANSAC+DRPM:    {devtime(solve_body, (jnp.zeros(()), jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

# --- full ICP step ---
icp = _make_icp_step(cfg)
def icp_body(args):
    x, acc = args
    f2 = dataclasses.replace(flat, xyz=flat.xyz + x * 1e-20)
    rpose, i, nc, conv = icp(f2, target, key, None)
    s = jnp.sum(rpose[:3, 3]) + i.astype(jnp.float32)
    return (x + s * 1e-20, acc + s)
print(f"full ICP step:  {devtime(icp_body, (jnp.zeros(()), jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

# iterations actually taken
rpose, iters, nc, conv = icp(flat, target, key, None)
print("icp iters:", int(iters), "ncorr:", int(nc))
