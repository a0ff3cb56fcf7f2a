"""Stage-level device timing of the FAITHFUL front-end (reference config.json:
pointcloud/pca normals + geometric_features presample + major_axis/FPS
sampling) — the round-4 drill-down of the faithful-config frame budget."""
import numpy as np
import jax, jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.devtime import devtime
from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.ops import preprocess as pre_ops, normals as normals_ops, features, sampling

CAP = 57600
cfg = cfgmod.load("/root/reference/config.json",
                  sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4))
sr = cfg.scan_registration
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = synthetic.synthetic_sequence(2, n_scans=64, azimuth_steps=900,
                                        speed=0.5, seed=11, world=world)
pts = np.zeros((CAP, 4), np.float32)
n = min(len(scans[0]), CAP); pts[:n] = scans[0][:n]
ptsd = jnp.asarray(pts); nv = jnp.asarray(n, jnp.int32)
key = jax.random.PRNGKey(0)

def t(name, body, init):
    print(f"{name:44s} {devtime(body, init, fetch=lambda a: a[1]):.2f} ms", flush=True)

# 1. preprocess (ring-sorted)
t("preprocess sorted", lambda a: (a[0] + 0 * a[1] * 1e-20, a[1] + pre_ops.preprocess(
    a[0], nv, cfg.sensor).valid.sum().astype(jnp.float32)), (ptsd, jnp.zeros(())))

rc = pre_ops.preprocess(ptsd, nv, cfg.sensor)
jax.block_until_ready(rc.xyz)

# 2. PCA normals (kdtree neighbor_scan — the faithful mode)
def body_pca(a):
    x, acc = a
    rc2 = __import__("dataclasses").replace(rc, xyz=rc.xyz + x * 1e-20)
    nres = normals_ops.compute_normals_pca(rc2, sr.compute_normal_method.pca,
                                           sr.use_all_points)
    s = nres.cloud.normal.sum() + nres.cloud.eigvals.sum()
    return (x + s * 1e-20, acc + s)
t("pca normals (kdtree mode)", body_pca, (jnp.zeros(()), jnp.zeros(())))

nres = normals_ops.compute_normals_pca(rc, sr.compute_normal_method.pca, sr.use_all_points)
cloud = nres.cloud
jax.block_until_ready(cloud.xyz)
cand0 = features.presample_geometric(
    cloud.eigvals, cloud.valid,
    sr.presample_method.geometric_features.planarity_threshold) & ~nres.plane_fail

# 3. presample
def body_pre(a):
    x, acc = a
    c = features.presample_geometric(cloud.eigvals + x * 1e-20, cloud.valid, 0.05)
    s = c.sum().astype(jnp.float32)
    return (x + s * 1e-20, acc + s)
t("presample geometric", body_pre, (jnp.zeros(()), jnp.zeros(())))

# 4. major_axis sampling (FPS strategy, vs previous cloud)
pts1 = np.zeros((CAP, 4), np.float32)
n1 = min(len(scans[1]), CAP); pts1[:n1] = scans[1][:n1]
rc1 = pre_ops.preprocess(jnp.asarray(pts1), jnp.asarray(n1, jnp.int32), cfg.sensor)
last_xyz, last_valid = rc1.xyz, rc1.valid
ma = sr.sample_method.major_axis
FE_SIZE = max(ma.max_total_points,
              sr.sample_method.normal.azimuth_bins *
              sr.sample_method.normal.elevation_bins *
              sr.sample_method.normal.max_points_per_bin)

def body_ma(a):
    x, acc = a
    idx, iv = sampling.major_axis_sampling(
        cloud.xyz + x * 1e-20, cloud.normal, cand0, last_xyz, last_valid, key,
        ma.r, ma.r_proj, ma.max_total_points, ma.azimuth_bins, ma.elevation_bins,
        ma.min_points_per_bin, ma.max_points_per_bin, FE_SIZE,
        strategy=ma.sampling_strategy)
    s = idx.sum().astype(jnp.float32) + iv.sum()
    return (x + s * 1e-20, acc + s)
t("major_axis sampling (FPS)", body_ma, (jnp.zeros(()), jnp.zeros(())))

# 4b. the two phases of major_axis separately
def body_cyl(a):
    x, acc = a
    cnt, dsum = sampling.cylinder_stats(cloud.xyz[:12800] + x * 1e-20,
                                        cloud.normal[:12800], last_xyz,
                                        last_valid, ma.r_proj, ma.r)
    s = dsum.sum() + cnt.sum()
    return (x + s * 1e-20, acc + s)
t("  cylinder_stats 12.8k x 57.6k", body_cyl, (jnp.zeros(()), jnp.zeros(())))

bins = sampling.spherical_bins(cloud.normal, ma.azimuth_bins, ma.elevation_bins)
def body_fps(a):
    x, acc = a
    rank, counts = sampling.fps_rank_within_bins(
        cloud.xyz + x * 1e-20, bins, cand0, key, 64, bin_capacity=1024,
        max_rank=1024, needed=jnp.asarray(200, jnp.int32))
    s = rank.sum().astype(jnp.float32)
    return (x + s * 1e-20, acc + s)
t("  fps_rank (needed=200)", body_fps, (jnp.zeros(()), jnp.zeros(())))
