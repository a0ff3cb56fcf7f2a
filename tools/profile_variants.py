"""Compare front-end variants + ICP pieces with cache-defeating varied inputs.
Everything measured as a lax.scan over 8 DIFFERENT frames, one dispatch."""
import time
import numpy as np
import jax, jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models.pipeline import FrontEnd
from plo_tpu.models.odometry import _make_icp_step
from plo_tpu.ops import matching

world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
B = 8
scans, _ = synthetic.synthetic_sequence(2 * B, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)
CAP = 65536
raws = np.zeros((B, CAP, 4), np.float32)
nvs = np.zeros((B,), np.int32)
for j in range(B):
    raw = scans[j]
    n = min(len(raw), CAP)
    raws[j, :n, :4] = raw[:n, :4]
    nvs[j] = n
raws_d = jnp.asarray(raws); nvs_d = jnp.asarray(nvs)
key = jax.random.PRNGKey(0)

def timeit(name, fn, *a, reps=3):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/reps/B*1000:8.2f} ms/frame")
    return out

def fe_cfg(fmt, method, presample="geometric_features"):
    return cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(format=fmt, method=method),
            presample_method=cfgmod.PresampleConfig(method=presample),
            sample_method=cfgmod.SampleConfig(method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
        ),
        sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4),
    )

def scan_fe(fe):
    raw_fn = fe.raw_fn
    @jax.jit
    def run(raws, nvs):
        def step(carry, inp):
            raw, n = inp
            out = raw_fn(raw, n, key, carry.xyz, None, carry.valid, first_frame=False)
            return out.filtered, (out.flat.valid.sum(),)
        from plo_tpu.cloud import PointCloud
        last = PointCloud.zeros(fe.height * fe.width if fe.format == "range_image" else CAP)
        _, outs = jax.lax.scan(step, last, (raws, nvs))
        return outs
    return run

for fmt, m in [("pointcloud", "pca"), ("range_image", "pca"),
               ("range_image", "FALS"), ("pointcloud", "cross_product")]:
    fe = FrontEnd(fe_cfg(fmt, m), capacity=CAP)
    timeit(f"front-end {fmt}/{m}", scan_fe(fe), raws_d, nvs_d)

# ICP pieces over 8 different frame pairs: build flats/targets first
cfg = fe_cfg("pointcloud", "pca")
cfg = cfgmod.Config(
    scan_registration=cfg.scan_registration,
    laser_odometry=cfgmod.LaserOdometryConfig(
        matching_method=cfgmod.MatchingConfig(method="IMLS"),
        solve_method=cfgmod.SolveConfig(method="RANSAC", iterations=30,
            ransac=cfgmod.RANSACConfig(max_iterations=1000, distance_threshold=0.2,
                                       final_solve_method="DRPM")),
    ),
    sensor=cfgmod.SensorConfig(n_scans=64),
)
fe = FrontEnd(cfg, capacity=CAP)
flats, tgts = [], []
for j in range(B):
    a = fe.process(scans[j], jax.random.PRNGKey(j), None, first_frame=False)
    b = fe.process(scans[j + 1], jax.random.PRNGKey(100 + j), None, first_frame=False)
    tgts.append(a.filtered); flats.append(b.flat)
stack = lambda cs: jax.tree_util.tree_map(lambda *x: jnp.stack(x), *cs)
flats_s, tgts_s = stack(flats), stack(tgts)
jax.block_until_ready((flats_s, tgts_s))

icp = _make_icp_step(cfg, jit=False)
@jax.jit
def icp_scan(flats, tgts):
    def step(carry, inp):
        f, t = inp
        rpose, i, nc, conv = icp(f, t, key, None)
        return carry, (rpose, i)
    return jax.lax.scan(step, 0, (flats, tgts))[1]
out = timeit("icp_step (IMLS+RANSAC/DRPM, identity init)", icp_scan, flats_s, tgts_s)
print("   iters:", np.asarray(jax.device_get(out[1])))

imls_cfg = cfg.laser_odometry.matching_method.imls
@jax.jit
def pre_scan(tgts):
    def step(carry, t):
        n, ok = matching.precompute_target_normals(
            t.xyz, t.valid, imls_cfg.get_normals.r_normal,
            imls_cfg.get_normals.search_number_normal)
        return carry, n.sum()
    return jax.lax.scan(step, 0, tgts)[1]
timeit("precompute_target_normals (per frame)", pre_scan, tgts_s)

@jax.jit
def match_scan(flats, tgts):
    def step(carry, inp):
        f, t = inp
        res = matching.imls_project(f, t, imls_cfg, t.normal, t.valid)
        return carry, res.valid.sum()
    return jax.lax.scan(step, 0, (flats, tgts))[1]
timeit("imls_project (per call)", match_scan, flats_s, tgts_s)

from plo_tpu.solvers import solve_ransac
r = cfg.laser_odometry.solve_method.ransac
res0 = matching.imls_project(flats[0], tgts[0], imls_cfg, tgts[0].normal, tgts[0].valid)
ys = jnp.stack([matching.imls_project(flats[j], tgts[j], imls_cfg, tgts[j].normal, tgts[j].valid).y for j in range(B)])
ns = jnp.stack([matching.imls_project(flats[j], tgts[j], imls_cfg, tgts[j].normal, tgts[j].valid).normal for j in range(B)])
vs = jnp.stack([matching.imls_project(flats[j], tgts[j], imls_cfg, tgts[j].normal, tgts[j].valid).valid for j in range(B)])
jax.block_until_ready((ys, ns, vs))
@jax.jit
def solve_scan(xs, ys, ns, vs):
    def step(carry, inp):
        x, y, n, v = inp
        d, ok = solve_ransac(x, y, n, v, key, r.max_iterations, r.distance_threshold,
                             r.min_inliers_percentage, r.huber_threshold,
                             r.final_solve_method, r.ls_threshold, r.drpm_threshold,
                             r.drpm_stdev_points, r.drpm_stdev_normals)
        return carry, d[0, 0]
    return jax.lax.scan(step, 0, (xs, ys, ns, vs))[1]
xs = jnp.stack([f.xyz for f in flats])
timeit("solve RANSAC-1000+DRPM (per call)", solve_scan, xs, ys, ns, vs)
