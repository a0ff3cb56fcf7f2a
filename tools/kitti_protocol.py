"""KITTI-protocol long-trajectory validation (VERDICT r4 next-round #4).

The reference's own evaluation protocol is KITTI's segment-based drift
metric (/root/reference/README.md:76-78; translational %/length, rotational
deg/length over fixed-distance segments). No KITTI data ships in this
environment, so this drill runs the closest available substitute: a 128-frame
synthetic rectangle LOOP (four 90-degree turns, ends back at the start — a
genuine revisit) at HDL-64 density (64 x 900), evaluated with
`plo_tpu.utils.evaluate.kitti_odometry_errors` at segment lengths scaled to
the ~130 m course (25/50/75/100 m vs KITTI's 100-800 m), on BOTH the
headline config and the faithful reference config (config.json 1:1).

Run on the chip:  python tools/kitti_protocol.py
CPU (scaled):     JAX_PLATFORMS=cpu python tools/kitti_protocol.py --small
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".kitti_protocol_scans_v1.npz")


def build_sequence(small: bool, laps: int = 1):
    from plo_tpu.io import synthetic

    # Turn rates: 90 deg over n_turn frames. 48 frames = 1.875 deg/frame =
    # KITTI's typical 10 Hz urban corner; 24 = 3.75 deg/frame (sharp). At
    # >=7.5 deg/frame the 0.2 m RANSAC gate collapses the inlier set under
    # the constant-velocity prior mismatch and DRPM (faithfully) zeroes the
    # under-observed directions — measured catastrophic at 32-beam sparsity,
    # so those rates test the failure mode, not the odometry.
    if small:
        n_scans, az, n_straight, n_turn, speed = 32, 450, 10, 24, 1.0
    else:
        n_scans, az, n_straight, n_turn, speed = 64, 900, 20, 48, 1.2
    speeds, yaw_rates = synthetic.rectangle_loop_profile(
        n_straight=n_straight, n_turn=n_turn, speed=speed, laps=laps)
    n_frames = len(speeds)
    cache = _CACHE if not small else _CACHE.replace("_v1", "_small_v1")
    cache = cache.replace("_v1", "_v4")  # v4: ramped+smoothed profile
    if laps != 1:
        cache = cache.replace(".npz", f"_laps{laps}.npz")
    if os.path.exists(cache):
        try:
            d = np.load(cache)
            if int(d["n"]) == n_frames:
                return [d[f"s{i}"] for i in range(n_frames)], d["gt"]
        except Exception:
            pass
    # World carved around the loop so turns never drive into boxes.
    scans, gt = synthetic.synthetic_sequence(
        n_frames, n_scans=n_scans, azimuth_steps=az, speed=speeds,
        yaw_rate=yaw_rates, seed=23)
    try:
        np.savez(cache, n=n_frames, gt=gt, **{f"s{i}": s for i, s in enumerate(scans)})
    except Exception:
        pass
    return scans, gt


def run_config(name, cfg, scans, capacity, transfer="int16", batch=8):
    from plo_tpu.models import Odometry

    odo = Odometry(cfg, capacity=capacity, seed=0, async_mode=True,
                   transfer=transfer)
    t0 = time.perf_counter()
    odo.process_scans(scans, batch=batch)
    traj = odo.finalize()
    dt = time.perf_counter() - t0
    poses = np.stack([f.pose for f in traj])
    return poses, len(scans) / dt


def evaluate_run(name, est, gt, lengths):
    from plo_tpu.utils import evaluate

    gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    ate = evaluate.ate_rmse(est, gtr, align=False)
    t_err, r_err, per_len = evaluate.kitti_odometry_errors(
        est, gtr, lengths=lengths, step=4)
    rec = {
        "config": name,
        "ate_m": round(ate, 4),
        "kitti_t_drift_pct": round(t_err * 100, 4),
        "kitti_r_drift_deg_per_100m": round(np.degrees(r_err) * 100, 4),
        "per_length": {str(L): {"t_pct": round(v[0] * 100, 4),
                                "r_deg_per_100m": round(np.degrees(v[1]) * 100, 4),
                                "segments": v[2]} for L, v in per_len.items()},
    }
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="32x450 scans, shorter loop (CPU-friendly)")
    ap.add_argument("--configs", default="headline,faithful")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the image pins the axon TPU "
                         "platform even over JAX_PLATFORMS)")
    ap.add_argument("--close-loops", action="store_true",
                    help="also apply loop closure (models/loopclosure.py) "
                         "and report the corrected metrics")
    ap.add_argument("--laps", type=int, default=1,
                    help="laps around the rectangle (2+ = every segment is "
                         "revisited; the loop-closure showcase)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from plo_tpu import config as cfgmod

    scans, gt = build_sequence(args.small, laps=args.laps)
    dist = np.concatenate([[0], np.cumsum(np.linalg.norm(
        np.diff(gt[:, :3, 3], axis=0), axis=1))])
    closure = np.linalg.norm(gt[-1, :3, 3] - gt[0, :3, 3])
    print(f"# {len(scans)} frames, {dist[-1]:.1f} m traveled, "
          f"loop-closure gap {closure:.1f} m", file=sys.stderr)
    lengths = (15, 30, 45, 60) if args.small else (25, 50, 75, 100)

    n_scans = 32 if args.small else 64
    az_res = 0.8 if args.small else 0.4
    sensor = cfgmod.SensorConfig(n_scans=n_scans, azimuth_resolution=az_res)
    capacity = n_scans * (450 if args.small else 900)

    results = []
    for name in args.configs.split(","):
        if name == "headline":
            cfg = cfgmod.Config(
                scan_registration=cfgmod.ScanRegistrationConfig(
                    compute_normal_method=cfgmod.ComputeNormalConfig(
                        format="range_image", method="pca"),
                    presample_method=cfgmod.PresampleConfig(method="geometric_features"),
                    sample_method=cfgmod.SampleConfig(
                        method="random",
                        random=cfgmod.RandomSampleConfig(max_points=2000)),
                ),
                laser_odometry=cfgmod.LaserOdometryConfig(
                    refresh_correspondences=False,
                    matching_method=cfgmod.MatchingConfig(method="IMLS"),
                    solve_method=cfgmod.SolveConfig(
                        method="RANSAC", iterations=30,
                        ransac=cfgmod.RANSACConfig(
                            max_iterations=1000, distance_threshold=0.2,
                            final_solve_method="DRPM")),
                ),
                sensor=sensor)
        elif name == "faithful":
            cfg = cfgmod.load("/root/reference/config.json", sensor=sensor)
        elif name == "faithful_prior":
            # The reference's exact algorithm with ONE knob flipped: the
            # constant-velocity ICP init (the intent of its commented-out
            # TransformToStart, laser_odometry.cpp:459). Separates "the
            # faithful math fails at KITTI speeds" (true of the shipped
            # identity init, BASELINE.md trajectory table) from "the
            # faithful math is wrong" (false — see the drill results).
            import dataclasses as dc
            cfg = cfgmod.load("/root/reference/config.json", sensor=sensor)
            cfg = dc.replace(cfg, laser_odometry=dc.replace(
                cfg.laser_odometry, motion_prior=True))
        else:
            raise SystemExit(f"unknown config {name!r}")
        est, rate = run_config(name, cfg, scans, capacity,
                               transfer="float32" if name == "faithful" else "int16")
        rec = evaluate_run(name, est, gt, lengths)
        rec["scans_per_sec"] = round(rate, 2)
        results.append(rec)
        print(json.dumps(rec))
        if args.close_loops:
            from plo_tpu.models import loopclosure as lc_mod
            corrected, loop_edges = lc_mod.close_loops(
                cfg, scans, est, min_gap=80, radius=5.0, capacity=capacity)
            rec2 = evaluate_run(name + "+loopclosure", corrected, gt, lengths)
            rec2["loop_edges"] = [(int(i), int(j), int(n))
                                  for i, j, _, n in loop_edges]
            print(json.dumps(rec2))


if __name__ == "__main__":
    main()
