"""Method-matrix ATE regression — the results.png analog (VERDICT r1 item 9).

Runs every GREEN reference method combination (results.png / README.md:113-115:
normals=pca x presample {geometric_features, curvature} x samplers
{three_axis, random, major_axis} x matching {IMLS, plane_ICP} x solvers
{Ceres, LS, RANSAC}) on a hardened synthetic sequence: structured corridor
world + 2 cm range noise + per-point sweep-motion distortion + 1% dynamic
outliers. Prints a markdown table + one JSON line per combo.

Usage: python tools/method_matrix.py [--frames 6] [--fast]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="per-combo converged = ATE below this (m)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import plo_tpu.io.synthetic as synthetic
    from plo_tpu import config as cfgmod
    from plo_tpu.models import Odometry
    from plo_tpu.utils import evaluate

    N_SCANS, AZ = 32, 450
    orig_render = synthetic.render_scan

    def noisy_render(*a, **kw):
        kw["noise_std"] = 0.02
        return orig_render(*a, **kw)

    synthetic.render_scan = noisy_render
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    scans, gt = synthetic.synthetic_sequence(
        args.frames, n_scans=N_SCANS, azimuth_steps=AZ, speed=0.4,
        yaw_rate=0.01, seed=3, world=world)
    synthetic.render_scan = orig_render
    rng = np.random.default_rng(5)
    scans = synthetic.add_outliers(
        synthetic.distort_sequence(scans, gt, N_SCANS), rng)
    gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)

    def mkcfg(presample, sampler, match, solver):
        sm = {"three_axis": cfgmod.SampleConfig(
                  method="three_axis",
                  three_axis=cfgmod.ThreeAxisConfig(points_per_list=167)),
              "random": cfgmod.SampleConfig(
                  method="random", random=cfgmod.RandomSampleConfig(max_points=1500)),
              "major_axis": cfgmod.SampleConfig(
                  method="major_axis",
                  major_axis=cfgmod.MajorAxisConfig(max_total_points=1500))}[sampler]
        sv = dict(method=solver, iterations=30)
        if solver == "RANSAC":
            sv["ransac"] = cfgmod.RANSACConfig(
                max_iterations=500, distance_threshold=0.3, final_solve_method="DRPM")
        return cfgmod.Config(
            scan_registration=cfgmod.ScanRegistrationConfig(
                compute_normal_method=cfgmod.ComputeNormalConfig(
                    format="pointcloud", method="pca"),
                presample_method=cfgmod.PresampleConfig(method=presample),
                sample_method=sm,
            ),
            laser_odometry=cfgmod.LaserOdometryConfig(
                matching_method=cfgmod.MatchingConfig(method=match),
                solve_method=cfgmod.SolveConfig(**sv),
            ),
            sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ),
        )

    rows = []
    fail = 0
    for presample in ("geometric_features", "curvature"):
        for sampler in ("three_axis", "random", "major_axis"):
            for match in ("IMLS", "plane_ICP"):
                for solver in ("Ceres", "LS", "RANSAC"):
                    t0 = time.time()
                    try:
                        odo = Odometry(mkcfg(presample, sampler, match, solver),
                                       capacity=16384, seed=0)
                        for s in scans:
                            odo.process_scan(s)
                        ate = float(evaluate.ate_rmse(odo.poses(), gtr, align=False))
                    except Exception as e:  # noqa: BLE001
                        ate = float("nan")
                        print(f"EXC {presample}/{sampler}/{match}/{solver}: {e}",
                              flush=True)
                    ok = np.isfinite(ate) and ate < args.threshold
                    fail += 0 if ok else 1
                    row = dict(presample=presample, sampler=sampler, match=match,
                               solver=solver, ate_m=round(ate, 4), ok=bool(ok),
                               secs=round(time.time() - t0, 1))
                    rows.append(row)
                    print(json.dumps(row), flush=True)
                # 36 combos x fresh XLA-CPU compiles (the persistent cache is
                # disabled on CPU) accumulate live executables until LLVM's
                # allocator fails ("Cannot allocate memory" -> SIGSEGV,
                # observed once the round-5 rolled-kd variants grew the
                # programs). Drop compiled programs + tracing caches between
                # solver groups; the per-config lru caches
                # (models/odometry._cached_*) hold the python closures only.
                import jax
                from plo_tpu.models import odometry as odom_mod
                odom_mod._cached_frontend.cache_clear()
                odom_mod._cached_icp_step.cache_clear()
                odom_mod._cached_map_ops.cache_clear()
                odom_mod._cached_batch_step.cache_clear()
                jax.clear_caches()

    print("\n| presample | sampler | matching | solver | ATE (mm) | ok |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['presample']} | {r['sampler']} | {r['match']} | "
              f"{r['solver']} | {r['ate_m'] * 1000:.1f} | "
              f"{'yes' if r['ok'] else 'NO'} |")
    print(f"\n{len(rows) - fail}/{len(rows)} combos converged "
          f"(< {args.threshold} m ATE over {args.frames} frames with 2 cm "
          f"noise, sweep distortion, 1% outliers)")
    return 0 if fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
