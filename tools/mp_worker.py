"""Multi-process worker: runs ShardedMapOdometry as one process of a
jax.distributed CPU cluster (gloo collectives). Launched by
tests/test_distributed.py with 2 processes x 4 virtual devices each; every
process computes the same trajectory (replicated front-end, sharded map);
process 0 writes the resulting poses to --out.

This is the process-boundary analog of the reference's two-node launch
(planetary_slam_VLP_32.launch:17-19): instead of ROS pub/sub between
scan_registration and laser_odometry, N identical processes run the global
SPMD program with the map sharded across all their devices.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batched", action="store_true",
                    help="drive frames through the batched lax.scan sharded "
                         "driver (process_scans) instead of per-frame calls")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from plo_tpu.parallel import distributed

    nproc, pid = distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
        local_device_count=args.local_devices,
        platform="cpu")
    import jax
    import numpy as np
    assert nproc == args.num_processes
    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.local_devices, n_global

    from plo_tpu import config as cfgmod
    from plo_tpu.io import synthetic
    from plo_tpu.parallel import ShardedMapOdometry
    from plo_tpu.parallel.distributed import global_mesh

    # Mirrors tests/test_distributed.py::_dist_config — keep in sync.
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1024)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            target_mode="map",
            map=cfgmod.MapConfig(voxel_size=0.3, capacity=16384),
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(
                method="RANSAC", iterations=30,
                ransac=cfgmod.RANSACConfig(max_iterations=200,
                                           distance_threshold=0.2,
                                           final_solve_method="DRPM")),
            refresh_correspondences=False,
        ),
        sensor=cfgmod.SensorConfig(n_scans=32, azimuth_resolution=0.8),
    )
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    scans, _ = synthetic.synthetic_sequence(
        args.frames, n_scans=32, azimuth_steps=450, speed=0.5, yaw_rate=0.01,
        seed=3, world=world)

    mesh = global_mesh()
    sodo = ShardedMapOdometry(cfg, mesh, capacity=8192, seed=0, defer_fetch=True)
    if args.batched:
        sodo.process_scans(scans, batch=max(2, (args.frames - 1) // 2))
    else:
        for s in scans:
            sodo.process_scan(s)
    poses = sodo.poses()
    print(f"[proc {pid}] {len(poses)} frames, final t={poses[-1][:3, 3]}",
          flush=True)
    if args.out and pid == 0:
        np.save(args.out, poses)
    distributed.barrier("mp_worker_done")
    distributed.shutdown()


if __name__ == "__main__":
    main()
