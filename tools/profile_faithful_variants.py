"""Attribute the faithful batch_step's ~48 ms/frame device time by config
knock-outs: each variant rebuilds the REAL batched program with one stage
removed/cheapened, runs it on distinct scan batches (the axon relay caches
identical dispatches), and the delta vs the full config is that stage's cost
in its true compiled context (tools/profile_faithful_fe2.py's isolated-FE
numbers proved unreliable)."""
import dataclasses
import time
import numpy as np
import jax, jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.models.odometry import _cached_batch_step
import bench as B

CAP = 57600
batch = 8

base = cfgmod.load("/root/reference/config.json",
                   sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4))
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = B._cached_sequence(113, n_scans=64, azimuth_steps=900, speed=0.5,
                              yaw_rate=0.005, seed=11, world=world)


def pack(i0):
    raws = np.zeros((batch, CAP, 4), np.float32)
    nvs = np.zeros((batch,), np.int32)
    for j in range(batch):
        raw = scans[i0 + j]
        n = min(len(raw), CAP)
        raws[j, :n, :raw.shape[1]] = raw[:n, :4]
        nvs[j] = n
    return jnp.asarray(raws), jnp.asarray(nvs)


def measure(label, cfg):
    odo = Odometry(cfg, capacity=CAP, seed=0, async_mode=True, transfer="float32")
    odo.process_scans(scans[:1 + batch], batch=batch)
    odo.finalize()
    bs = _cached_batch_step(cfg, CAP, "float32")
    i0, times = 1 + batch, []
    window = odo._window_state()
    last, prior = odo.last_filtered, odo._last_rel
    frame0, key = jnp.asarray(odo.frame_count, jnp.int32), odo.key
    for rep in range(5):
        raws_d, nvs_d = pack(i0)
        jax.block_until_ready(raws_d)
        t0 = time.perf_counter()
        window, last, prior, outs = bs(raws_d, nvs_d, window, last, prior,
                                       frame0, key)
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
        frame0 = frame0 + batch
        i0 += batch
    ms = np.median(times[1:]) / batch * 1e3
    print(f"{label:58s} {ms:6.1f} ms/frame", flush=True)
    return ms


def sr_mod(**kw):
    return dataclasses.replace(base, scan_registration=dataclasses.replace(
        base.scan_registration, **kw))


full = measure("faithful FULL", base)

v = sr_mod(compute_normal_method=dataclasses.replace(
    base.scan_registration.compute_normal_method,
    pca=dataclasses.replace(base.scan_registration.compute_normal_method.pca,
                            neighbor_scan="index")))
measure("  pca neighbor_scan=index", v)

v = sr_mod(sample_method=dataclasses.replace(
    base.scan_registration.sample_method, method="random"))
measure("  sample=random (no major_axis)", v)

v = sr_mod(sample_method=dataclasses.replace(
    base.scan_registration.sample_method,
    major_axis=dataclasses.replace(
        base.scan_registration.sample_method.major_axis,
        sampling_strategy="random")))
measure("  major_axis strategy=random (no per-bin FPS)", v)

v = sr_mod(compute_normal_method=cfgmod.ComputeNormalConfig(
    format="range_image", method="pca"))
measure("  range_image/pca (no ring sort, grid normals)", v)

v = dataclasses.replace(base, laser_odometry=dataclasses.replace(
    base.laser_odometry, refresh_correspondences=False))
measure("  refresh_correspondences=False (frozen search)", v)

lo = base.laser_odometry
v = dataclasses.replace(base, laser_odometry=dataclasses.replace(
    lo, solve_method=dataclasses.replace(
        lo.solve_method, ransac=dataclasses.replace(
            lo.solve_method.ransac, max_iterations=1000))))
measure("  RANSAC-1000 (vs 5000)", v)

v = dataclasses.replace(base, laser_odometry=dataclasses.replace(
    lo, solve_method=dataclasses.replace(lo.solve_method, method="LS")))
measure("  solve=LS (no RANSAC/DRPM)", v)
