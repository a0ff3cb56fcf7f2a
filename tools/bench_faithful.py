"""Faithful-semantics throughput: the reference's shipped config.json run
as-is (pointcloud/pca front-end, major_axis sampling, IMLS with per-iteration
re-search, RANSAC-5000/DRPM, identity ICP init, f32 transfer, per-frame
single dispatch) — the apples-to-apples number next to the optimized bench
(bench.py documents each extension it adds and its measured ATE parity)."""
import json
import time
import numpy as np
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from plo_tpu import config as cfgmod
    from plo_tpu.models import Odometry
    import bench as B
    from plo_tpu.io import synthetic

    cfg = cfgmod.load("/root/reference/config.json",
                      sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4))
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
    scans, _ = B._cached_sequence(113, n_scans=64, azimuth_steps=900, speed=0.5,
                                  yaw_rate=0.005, seed=11, world=world)
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver", choices=["sync", "batched"], default="sync")
    args = ap.parse_args()

    if args.driver == "sync":
        # The reference's own execution model: one blocking frame at a time.
        odo = Odometry(cfg, capacity=57600, seed=0, transfer="float32")
        n_warm = 3
        for s in scans[:n_warm]:
            odo.process_scan(s)
        rates = []
        i = n_warm
        for _ in range(3):
            t0 = time.perf_counter()
            for s in scans[i:i + 8]:
                odo.process_scan(s)
            rates.append(8 / (time.perf_counter() - t0))
            i += 8
    else:
        # Same algorithm (config untouched), our batched async runtime.
        odo = Odometry(cfg, capacity=57600, seed=0, async_mode=True,
                       transfer="float32")
        odo.process_scans(scans[:9], batch=8)
        odo.finalize()
        rates = []
        i = 9
        for _ in range(3):
            t0 = time.perf_counter()
            odo.process_scans(scans[i:i + 16], batch=8)
            odo.sync()
            rates.append(16 / (time.perf_counter() - t0))
            i += 16
        odo.finalize()
    print(json.dumps({"metric": f"scans_per_sec_faithful_{args.driver}",
                      "value": round(float(np.median(rates)), 3),
                      "unit": "scans/s",
                      "vs_baseline": round(float(np.median(rates)) / 10.0, 3)}))


if __name__ == "__main__":
    main()
