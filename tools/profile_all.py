"""True device times for every pipeline stage via chained fori_loop differencing."""
import time
import numpy as np
import jax, jax.numpy as jnp

from tools.devtime import devtime
from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models.pipeline import FrontEnd
from plo_tpu.models.odometry import _make_icp_step
from plo_tpu.ops import matching
from plo_tpu.solvers import solve_ransac

world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = synthetic.synthetic_sequence(3, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)
CAP = 65536

def mkcfg(fmt, method):
    return cfgmod.Config(
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
        sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4),
    )

pts = np.zeros((CAP, 4), np.float32); n = min(len(scans[0]), CAP); pts[:n] = scans[0][:n]
ptsd = jnp.asarray(pts); nv = jnp.asarray(n, jnp.int32)
key = jax.random.PRNGKey(0)

for fmt, m in [("pointcloud", "pca"), ("range_image", "pca"), ("range_image", "FALS")]:
    fe = FrontEnd(mkcfg(fmt, m), capacity=CAP)
    raw_fn = fe.raw_fn
    P = fe.height * fe.width if fmt == "range_image" else CAP
    from plo_tpu.cloud import PointCloud
    last0 = PointCloud.zeros(P)
    def body(args, raw_fn=raw_fn, last0=last0):
        p, acc = args
        out = raw_fn(p, nv, key, last0.xyz, None, last0.valid, first_frame=False)
        s = out.flat.xyz.sum()
        return (p + s * 1e-20, acc + s)
    print(f"front-end {fmt}/{m}: {devtime(body, (ptsd, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

cfg = mkcfg("pointcloud", "pca")
fe = FrontEnd(cfg, capacity=CAP)
a = fe.process(scans[0], jax.random.PRNGKey(0), None, first_frame=False)
b = fe.process(scans[1], jax.random.PRNGKey(1), None, first_frame=False)
tgt, flat = a.filtered, b.flat
jax.block_until_ready((tgt, flat))
imls_cfg = cfg.laser_odometry.matching_method.imls

def body_match(args):
    fx, acc = args
    import dataclasses as dc
    res = matching.imls_project(dc.replace(flat, xyz=fx), tgt, imls_cfg, tgt.normal, tgt.valid)
    s = res.y.sum()
    return (fx + s * 1e-20, acc + s)
print(f"imls_project (2000x65536): {devtime(body_match, (flat.xyz, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

res = matching.imls_project(flat, tgt, imls_cfg, tgt.normal, tgt.valid)
jax.block_until_ready(res)
r = cfg.laser_odometry.solve_method.ransac
def body_solve(args):
    x, acc = args
    d, ok = solve_ransac(x, res.y, res.normal, res.valid, key, r.max_iterations,
                         r.distance_threshold, r.min_inliers_percentage, r.huber_threshold,
                         r.final_solve_method, r.ls_threshold, r.drpm_threshold,
                         r.drpm_stdev_points, r.drpm_stdev_normals)
    s = d.sum()
    return (x + s * 1e-20, acc + s)
print(f"solve RANSAC-1000+DRPM: {devtime(body_solve, (flat.xyz, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

icp = _make_icp_step(cfg, jit=False)
def body_icp(args):
    fx, acc = args
    import dataclasses as dc
    rpose, i, nc, conv = icp(dc.replace(flat, xyz=fx), tgt, key, None)
    s = rpose.sum()
    return (fx + s * 1e-20, acc + s)
print(f"icp_step full (identity init): {devtime(body_icp, (flat.xyz, jnp.zeros(())), fetch=lambda a: a[1], n_small=2, n_big=6):.2f} ms")
