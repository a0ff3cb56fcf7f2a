"""Map-mode throughput on the real chip: the frame-to-map driver (persistent
voxel map target, grid16 transfer, frozen-correspondence IMLS + RANSAC/DRPM)
under the same median-of-3-windows protocol as bench.py."""
import json
import time
import numpy as np
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(search="dense"):
    from plo_tpu import config as cfgmod
    from plo_tpu.io import synthetic
    from plo_tpu.models import Odometry

    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            compute_normal_method=cfgmod.ComputeNormalConfig(format="range_image", method="pca"),
            presample_method=cfgmod.PresampleConfig(method="geometric_features"),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=2000)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            target_mode="map",
            map=cfgmod.MapConfig(voxel_size=0.3, capacity=65536, search=search),
            refresh_correspondences=False,
            matching_method=cfgmod.MatchingConfig(method="IMLS"),
            solve_method=cfgmod.SolveConfig(
                method="RANSAC", iterations=30,
                ransac=cfgmod.RANSACConfig(max_iterations=1000, distance_threshold=0.2,
                                           final_solve_method="DRPM")),
        ),
        sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4),
    )
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
    batch = 16
    n_windows, window = 3, 32
    n_warm = 1 + batch
    scans, _ = synthetic.synthetic_sequence(
        n_warm + n_windows * window, n_scans=64, azimuth_steps=900, speed=0.5,
        yaw_rate=0.005, seed=11, world=world)

    odo = Odometry(cfg, capacity=57600, seed=0, async_mode=True, transfer="grid16")
    odo.process_scans(scans[:n_warm], batch=batch)
    odo.finalize()

    rates = []
    i = n_warm
    for _ in range(n_windows):
        t0 = time.perf_counter()
        odo.process_scans(scans[i:i + window], batch=batch)
        odo.sync()
        rates.append(window / (time.perf_counter() - t0))
        i += window
    odo.finalize()
    print(json.dumps({"metric": f"map_mode_scans_per_sec_{search}",
                      "value": round(float(np.median(rates)), 3),
                      "unit": "scans/s",
                      "vs_baseline": round(float(np.median(rates)) / 10.0, 3)}))


if __name__ == "__main__":
    import sys as _s
    main(_s.argv[1] if len(_s.argv) > 1 else "dense")
