"""Measured overhead of the sharded-map path (VERDICT r3 item 9): the same
frame-to-map trajectory through single-device map-mode Odometry vs
ShardedMapOdometry (defer_fetch) on an 8-device CPU mesh, same scans, same
config. The observable is the intra-process sharding overhead (shard_map
dispatch + all_gather of candidate rows + replicated front-end) relative to
the single-device baseline — the measured leg of the "compute-bound at both
scales" scaling argument in BASELINE.md.

Run on CPU (the environment has one TPU chip; sharding needs a mesh):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_sharded_map.py

Caveat for the `sharded batched` row: the CPU runtime executes each virtual
device's SPMD program on ONE thread, so the batched driver's replicated
in-scan front-end loses the intra-op threadpool that the per-frame path's
local jit uses — it measures 4-5x slower HERE (invariant to mesh size and
FE layout pinning), which is a virtual-mesh artifact, not a design cost; see
BASELINE.md's sharding-overhead section.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402


def main():
    from plo_tpu import config as cfgmod
    from plo_tpu.io import synthetic
    from plo_tpu.models import Odometry
    from plo_tpu.parallel import ShardedMapOdometry, get_mesh

    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1500)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            target_mode="map",
            map=cfgmod.MapConfig(voxel_size=0.3, capacity=32768),
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(
                method="RANSAC", iterations=30,
                ransac=cfgmod.RANSACConfig(max_iterations=300, distance_threshold=0.2,
                                           final_solve_method="DRPM")),
            refresh_correspondences=False,
        ),
        sensor=cfgmod.SensorConfig(n_scans=32, azimuth_resolution=0.8),
    )
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
    scans, _ = synthetic.synthetic_sequence(
        18, n_scans=32, azimuth_steps=450, speed=0.5, yaw_rate=0.01, seed=3,
        world=world)

    def run(make, batched=False):
        odo = make()
        for s in scans[:6]:   # warm (compile + map fill)
            odo.process_scan(s)
        if batched:  # warm the batch program at the SAME batch size it times
            odo.process_scans(scans[6:10], batch=4)
            odo.sync() if hasattr(odo, "sync") else None
            t0 = time.perf_counter()
            odo.process_scans(scans[10:18], batch=4)
            odo.finalize()
            dt = time.perf_counter() - t0
            return 8, dt, odo.poses()
        odo.sync() if hasattr(odo, "sync") else None
        t0 = time.perf_counter()
        for s in scans[6:]:
            odo.process_scan(s)
        (odo.finalize() if hasattr(odo, "finalize") else odo.poses())
        dt = time.perf_counter() - t0
        return len(scans) - 6, dt, odo.poses()

    n1, t1, p1 = run(lambda: Odometry(cfg, capacity=16384, seed=0))
    # 4 virtual devices: the 8-device mesh's collective rendezvous starves
    # on this 2-core host (8 participant threads must execute one collective
    # concurrently; XLA aborts after its 40 s rendezvous timeout). 4 devices
    # keep the measurement honest for the OVERHEAD ratio while fitting the
    # core budget; the 8-device numerical-equivalence checks live in
    # tests/test_parallel.py / test_map_store.py on tiny shapes.
    mesh = get_mesh(4)
    n8, t8, p8 = run(lambda: ShardedMapOdometry(cfg, mesh, capacity=16384,
                                                seed=0, defer_fetch=True))
    nb, tb, pb = run(lambda: ShardedMapOdometry(cfg, mesh, capacity=16384,
                                                seed=0, defer_fetch=True),
                     batched=True)
    dmax = float(np.linalg.norm(p1[:, :3, 3] - p8[:, :3, 3], axis=1).max())
    print(f"single-device map mode    : {n1 / t1:6.2f} scans/s ({t1 / n1 * 1e3:.1f} ms/frame)")
    print(f"sharded per-frame (4-dev) : {n8 / t8:6.2f} scans/s ({t8 / n8 * 1e3:.1f} ms/frame)")
    print(f"sharded batched   (4-dev) : {nb / tb:6.2f} scans/s ({tb / nb * 1e3:.1f} ms/frame)")
    print(f"intra-process sharding overhead: per-frame {(t8 / n8) / (t1 / n1):.2f}x, "
          f"batched {(tb / nb) / (t1 / n1):.2f}x; trajectory max |dt| {dmax * 1e3:.2f} mm")


if __name__ == "__main__":
    main()
