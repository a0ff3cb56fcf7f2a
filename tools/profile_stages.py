import time
import numpy as np
import jax, jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models.pipeline import FrontEnd
from plo_tpu.models.odometry import Odometry, _make_icp_step
from plo_tpu.ops import preprocess as pre_ops, normals as normals_ops, features, sampling, matching

cfg = cfgmod.Config(
    scan_registration=cfgmod.ScanRegistrationConfig(
        compute_normal_method=cfgmod.ComputeNormalConfig(format="pointcloud", method="pca"),
        presample_method=cfgmod.PresampleConfig(method="geometric_features"),
        sample_method=cfgmod.SampleConfig(method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
    ),
    laser_odometry=cfgmod.LaserOdometryConfig(
        matching_method=cfgmod.MatchingConfig(method="IMLS"),
        solve_method=cfgmod.SolveConfig(method="RANSAC", iterations=30,
            ransac=cfgmod.RANSACConfig(max_iterations=1000, distance_threshold=0.2,
                                       final_solve_method="DRPM")),
    ),
    sensor=cfgmod.SensorConfig(n_scans=64),
)
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = synthetic.synthetic_sequence(3, n_scans=64, azimuth_steps=900, speed=0.5, seed=11, world=world)

CAP = 65536
pts = np.zeros((CAP, 4), np.float32); n = min(len(scans[0]), CAP); pts[:n] = scans[0][:n]
ptsd = jnp.asarray(pts); nv = jnp.asarray(n, jnp.int32)
key = jax.random.PRNGKey(0)

def bench(name, fn, *a, reps=10, **kw):
    out = fn(*a, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:35s} {dt:8.2f} ms")
    return out

pp = jax.jit(lambda p, n: pre_ops.preprocess(p, n, cfg.sensor))
rc = bench("preprocess", pp, ptsd, nv)

sr = cfg.scan_registration
pca = jax.jit(lambda rc: normals_ops.compute_normals_pca(rc, sr.compute_normal_method.pca, sr.use_all_points))
nres = bench("pca normals (compact)", pca, rc)

geo_pres = jax.jit(lambda ev, v: features.presample_geometric(ev, v, sr.presample_method.geometric_features.planarity_threshold))
cand = bench("presample geometric", geo_pres, nres.cloud.eigvals, nres.cloud.valid)

samp = jax.jit(lambda c, k: sampling.random_sampling(c, k, 2000))
bench("random sampling", samp, cand, key)

fe = FrontEnd(cfg, capacity=CAP)
feo = bench("frontend total", lambda: fe._process(ptsd, nv, key, jnp.zeros((1,3),jnp.float32), None, jnp.zeros((1,),bool), first_frame=False), reps=10)

# back-end pieces
tgt = feo.filtered
flat = feo.flat
imls = jax.jit(lambda s, t: matching.imls_project(s, t, cfg.laser_odometry.matching_method.imls, t.normal, t.valid))
res = bench("IMLS match (1 iter)", imls, flat, tgt)

from plo_tpu.solvers import solve_ransac
r = cfg.laser_odometry.solve_method.ransac
solv = jax.jit(lambda s, y, nn, v, k: solve_ransac(s, y, nn, v, k, r.max_iterations,
    r.distance_threshold, r.min_inliers_percentage, r.huber_threshold,
    r.final_solve_method, r.ls_threshold, r.drpm_threshold,
    r.drpm_stdev_points, r.drpm_stdev_normals))
bench("RANSAC-1000+DRPM solve (1 iter)", solv, flat.xyz, res.y, res.normal, res.valid, key)

icp = _make_icp_step(cfg)
bench("full ICP step (while_loop)", icp, flat, tgt, key, None)
