"""Wall decomposition of the FAITHFUL batched loop: host pack, H2D, the
batch_step device program, fetch — the numbers that bound
tools/bench_faithful.py --driver batched. Distinct scans per rep (the axon
relay caches identical dispatches, tools/probe_cache.py)."""
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

cfg = cfgmod.load("/root/reference/config.json",
                  sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4))
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = B._cached_sequence(113, n_scans=64, azimuth_steps=900, speed=0.5,
                              yaw_rate=0.005, seed=11, world=world)

odo = Odometry(cfg, capacity=CAP, seed=0, async_mode=True, transfer="float32")
odo.process_scans(scans[:1 + batch], batch=batch)
odo.finalize()

bs = _cached_batch_step(cfg, CAP, "float32")
i0 = 1 + batch
for rep in range(4):
    t0 = time.perf_counter()
    raws = np.zeros((batch, CAP, 4), np.float32)
    nvs = np.zeros((batch,), np.int32)
    for j in range(batch):
        raw = scans[i0 + j]
        n = min(len(raw), CAP)
        raws[j, :n, :raw.shape[1]] = raw[:n, :4]
        nvs[j] = n
    t1 = time.perf_counter()
    raws_d = jnp.asarray(raws)
    nvs_d = jnp.asarray(nvs)
    jax.block_until_ready(raws_d)
    t2 = time.perf_counter()
    window = odo._window_state()
    prior = odo._last_rel if odo._last_rel is not None else jnp.eye(4, jnp.float32)
    frame0 = jnp.asarray(odo.frame_count, jnp.int32)
    new_window, new_last, new_prior, outs = bs(
        raws_d, nvs_d, window, odo.last_filtered, prior, frame0, odo.key)
    jax.block_until_ready(outs)
    t3 = time.perf_counter()
    got = jax.device_get(outs)
    t4 = time.perf_counter()
    # Advance the state so each rep sees fresh scans (defeats relay caching
    # and keeps the window realistic).
    odo._device_window = new_window
    odo.last_filtered = new_last
    odo._last_rel = new_prior
    odo.frame_count += batch
    i0 += batch
    print(f"rep{rep}: pack={1e3*(t1-t0):6.1f} H2D={1e3*(t2-t1):6.1f} "
          f"device={1e3*(t3-t2):6.1f} fetch={1e3*(t4-t3):6.1f} ms "
          f"({1e3*(t3-t2)/batch:.1f} ms/frame device)", flush=True)
print("iters per frame:", got[:, 16])
