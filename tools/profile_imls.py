"""IMLS matcher internals, cache-defeated via scan over 8 different frame pairs."""
import time
import numpy as np
import jax, jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models.pipeline import FrontEnd
from plo_tpu.ops import neighbors, matching

world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
B = 8
scans, _ = synthetic.synthetic_sequence(B + 1, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)
CAP = 65536
cfg = cfgmod.Config(
    scan_registration=cfgmod.ScanRegistrationConfig(
        compute_normal_method=cfgmod.ComputeNormalConfig(format="pointcloud", method="pca"),
        presample_method=cfgmod.PresampleConfig(method="geometric_features"),
        sample_method=cfgmod.SampleConfig(method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
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

def timeit(name, fn, *a, reps=3):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/reps/B*1000:8.2f} ms/frame")
    return out

def scan_over(fn):
    @jax.jit
    def run(flats, tgts):
        def step(c, inp):
            f, t = inp
            return c, fn(f, t)
        return jax.lax.scan(step, 0, (flats, tgts))[1]
    return run

imls_cfg = cfg.laser_odometry.matching_method.imls
k = imls_cfg.search_number

timeit("knn k=20 approx (full imls search)",
       scan_over(lambda f, t: neighbors.knn(f.xyz, t.xyz, t.valid, k=k, radius=imls_cfg.r, select="approx")[0].sum()),
       flats_s, tgts_s)
timeit("knn k=20 exact",
       scan_over(lambda f, t: neighbors.knn(f.xyz, t.xyz, t.valid, k=k, radius=imls_cfg.r, select="exact")[0].sum()),
       flats_s, tgts_s)
timeit("nearest (k=1 chunked)",
       scan_over(lambda f, t: neighbors.nearest(f.xyz, t.xyz, t.valid, radius=imls_cfg.r)[0].sum()),
       flats_s, tgts_s)

def imls_post(f, t):
    # everything after the kNN: gathers + weighting (fake idx to isolate)
    S = f.xyz.shape[0]
    nidx = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (S, 1))
    near_d2 = jnp.ones((S, k), jnp.float32)
    nfound = jnp.ones((S, k), bool)
    npts = t.xyz[nidx]; nnrm = t.normal[nidx]
    n_ok = nfound & neighbors.gather_mask(t.valid, nidx)
    diff = f.xyz[:, None, :] - npts
    d2e = jnp.sum(diff * diff, -1)
    w = jnp.where(n_ok, jnp.exp(-d2e), 0.0)
    proj = jnp.sum(diff * nnrm, -1)
    return (jnp.sum(w * proj, 1) / (jnp.sum(w, 1) + 1e-5)).sum()
timeit("imls post-knn (gathers+weights)", scan_over(imls_post), flats_s, tgts_s)

timeit("imls_project total (approx)",
       scan_over(lambda f, t: matching.imls_project(f, t, imls_cfg, t.normal, t.valid).y.sum()),
       flats_s, tgts_s)

# chunk-size sensitivity
for chunk in (16384, 32768, 65536):
    timeit(f"knn k=20 approx chunk={chunk}",
           scan_over(lambda f, t, c=chunk: neighbors.knn(f.xyz, t.xyz, t.valid, k=k, radius=imls_cfg.r, select="approx", chunk=c)[0].sum()),
           flats_s, tgts_s)
# compact the target to valid-only prefix of 49152?
timeit("knn k=20 approx, target trimmed to 49152",
       scan_over(lambda f, t: neighbors.knn(f.xyz, t.xyz[:49152], t.valid[:49152], k=k, radius=imls_cfg.r, select="approx")[0].sum()),
       flats_s, tgts_s)
