"""Instrument the batched odometry driver phase by phase on the real chip."""
import time
import numpy as np
import jax, jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry

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
batch = 8
scans, _ = synthetic.synthetic_sequence(1 + 4 * batch, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)
odo = Odometry(cfg, capacity=65536, seed=0, async_mode=True)
odo.process_scans(scans[:1 + batch], batch=batch)
odo.finalize()

cap = 65536
from plo_tpu.models.odometry import _cached_batch_step
bs = _cached_batch_step(odo.cfg, odo.frontend.capacity, odo.transfer)
i0 = 1 + batch
for it in range(3):
    t0 = time.perf_counter()
    raws = np.zeros((batch, cap, 4), np.float32)
    nvs = np.zeros((batch,), np.int32)
    for j in range(batch):
        raw = scans[i0 + j]
        n = min(len(raw), cap)
        raws[j, :n, :4] = raw[:n, :4]
        nvs[j] = n
    t1 = time.perf_counter()
    raws_d = jnp.asarray(raws); nvs_d = jnp.asarray(nvs)
    jax.block_until_ready(raws_d)
    t2 = time.perf_counter()
    window = odo._window_state()
    prior = odo._last_rel
    frame0 = jnp.asarray(odo.frame_count, jnp.int32)
    jax.block_until_ready(window)
    t3 = time.perf_counter()
    new_window, new_last, new_prior, outs = bs(raws_d, nvs_d, window, odo.last_filtered, prior, frame0, odo.key)
    jax.block_until_ready(new_window)
    t4 = time.perf_counter()
    rposes, iters, ncorrs, stats = outs
    got = jax.device_get((rposes, iters, ncorrs, stats))
    t5 = time.perf_counter()
    odo._last_rel = new_prior
    odo.cloud_queue.clear()
    for slot in range(cfg.laser_odometry.max_queue_size):
        odo.cloud_queue.append(jax.tree_util.tree_map(lambda a: a[slot], new_window))
    odo.last_filtered = new_last
    odo.frame_count += batch
    i0 += batch
    print(f"iter{it}: host-pack {1000*(t1-t0):6.1f} | H2D {1000*(t2-t1):6.1f} | "
          f"window {1000*(t3-t2):6.1f} | batch_step {1000*(t4-t3):6.1f} | "
          f"D2H outs {1000*(t5-t4):6.1f} ms")
