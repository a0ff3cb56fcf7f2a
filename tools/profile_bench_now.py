"""End-to-end wall decomposition of the CURRENT bench loop: host pack,
H2D, batch_step device time, drain."""
import time
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from plo_tpu import config as cfgmod, native
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.models.odometry import _cached_batch_step

cfg = cfgmod.Config(
    scan_registration=cfgmod.ScanRegistrationConfig(
        compute_normal_method=cfgmod.ComputeNormalConfig(format="range_image", method="pca"),
        presample_method=cfgmod.PresampleConfig(method="geometric_features"),
        sample_method=cfgmod.SampleConfig(method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
    ),
    laser_odometry=cfgmod.LaserOdometryConfig(
        refresh_correspondences=False,
        matching_method=cfgmod.MatchingConfig(method="IMLS"),
        solve_method=cfgmod.SolveConfig(method="RANSAC", iterations=30,
            ransac=cfgmod.RANSACConfig(max_iterations=1000, distance_threshold=0.2,
                                       final_solve_method="DRPM")),
    ),
    sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4),
)
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
batch = 16
CAP = 57600
scans, _ = synthetic.synthetic_sequence(1 + 3 * batch, n_scans=64, azimuth_steps=900,
                                        speed=0.5, yaw_rate=0.005, seed=11, world=world)
odo = Odometry(cfg, capacity=CAP, seed=0, async_mode=True, transfer="grid16")
odo.process_scans(scans[:1 + batch], batch=batch)
odo.finalize()

bs = _cached_batch_step(odo.cfg, CAP, "grid16")
inv = np.float32(1.0 / odo.TRANSFER_QUANT_SCALE)
for rep in range(3):
    i0 = 1 + batch
    t0 = time.perf_counter()
    h, w = odo.frontend.height, odo.frontend.width
    raws = np.zeros((batch, h, w), np.uint16)
    nvs = np.zeros((batch,), np.int32)
    for j in range(batch):
        raws[j] = odo._pack_grid(scans[i0 + j])
        nvs[j] = int((raws[j] > 0).sum())
    t1 = time.perf_counter()
    raws_d = jnp.asarray(raws); nvs_d = jnp.asarray(nvs)
    jax.block_until_ready(raws_d)
    t2 = time.perf_counter()
    window = odo._window_state()
    prior = odo._last_rel
    frame0 = jnp.asarray(odo.frame_count, jnp.int32)
    nw, nl, npr, outs = bs(raws_d, nvs_d, window, odo.last_filtered, prior, frame0, odo.key)
    jax.block_until_ready(outs)
    t3 = time.perf_counter()
    got = jax.device_get(outs)
    t4 = time.perf_counter()
    print(f"rep{rep}: pack={1e3*(t1-t0):6.1f} H2D={1e3*(t2-t1):6.1f} "
          f"device={1e3*(t3-t2):6.1f} fetch={1e3*(t4-t3):6.1f} ms "
          f"-> {batch/(t4-t0):5.1f} scans/s (device-only {batch/(t3-t2):5.1f}/s)", flush=True)
