"""Why does the 8-frame batch_step take ~300ms when components sum to ~10ms?"""
import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.models.odometry import _make_icp_step

def mkcfg(iters):
    return cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(format="pointcloud", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(method="RANSAC", iterations=iters,
                ransac=cfgmod.RANSACConfig(max_iterations=1000, distance_threshold=0.2,
                                           final_solve_method="DRPM")),
        ),
        sensor=cfgmod.SensorConfig(n_scans=64),
    )

world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
batch = 8
scans, _ = synthetic.synthetic_sequence(1 + 2 * batch, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)

def timeit(name, fn, *a, reps=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter()-t0)/reps*1000:8.1f} ms")
    return out

for iters in (30, 4):
    cfg = mkcfg(iters)
    odo = Odometry(cfg, capacity=65536, seed=0, async_mode=True)
    odo.process_scans(scans[:1 + batch], batch=batch)
    odo.finalize()
    cap = 65536
    raws = np.zeros((batch, cap, 4), np.float32)
    nvs = np.zeros((batch,), np.int32)
    for j in range(batch):
        raw = scans[1 + batch + j]
        n = min(len(raw), cap)
        raws[j, :n, :4] = raw[:n, :4]
        nvs[j] = n
    raws_d = jax.device_put(jnp.asarray(raws)); jax.block_until_ready(raws_d)
    nvs_d = jnp.asarray(nvs)
    window = odo._window_state()
    prior = odo._last_rel
    frame0 = jnp.asarray(odo.frame_count, jnp.int32)
    from plo_tpu.models.odometry import _cached_batch_step
    bs = _cached_batch_step(odo.cfg, odo.frontend.capacity, odo.transfer)
    out = timeit(f"batch_step(8) iterations={iters}", bs, raws_d, nvs_d, window, odo.last_filtered, prior, frame0, odo.key)
    iters_used = np.asarray(jax.device_get(out[3][1]))
    print("   per-frame ICP iterations:", iters_used)

# front-end-only scan over 8 frames
cfg = mkcfg(30)
odo = Odometry(cfg, capacity=65536, seed=0, async_mode=True)
odo.process_scans(scans[:1 + batch], batch=batch)
odo.finalize()
fe_raw = odo.frontend.raw_fn
key = jax.random.PRNGKey(0)

@jax.jit
def fe_scan(raws, nvs, last):
    def step(carry, inp):
        last = carry
        raw, n = inp
        out = fe_raw(raw, n, key, last.xyz, None, last.valid, first_frame=False)
        return out.filtered, out.flat.valid.sum()
    last, outs = jax.lax.scan(step, last, (raws, nvs))
    return outs

raws_d = jnp.asarray(np.random.default_rng(0).uniform(-50, 50, (batch, 65536, 4)).astype(np.float32))
nvs_d = jnp.full((batch,), 57000, jnp.int32)
jax.block_until_ready(raws_d)
timeit("front-end-only scan over 8 frames", fe_scan, raws_d, nvs_d, odo.last_filtered)

# icp-step-only on realistic consecutive frames
icp = _make_icp_step(cfg)
fe_a = odo.frontend.process(scans[9], jax.random.PRNGKey(1), None, first_frame=False)
fe_b = odo.frontend.process(scans[10], jax.random.PRNGKey(2), None, first_frame=False)
timeit("icp_step real consecutive frames", icp, fe_b.flat, fe_a.filtered, jax.random.PRNGKey(3), odo._last_rel)
