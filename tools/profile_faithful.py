"""Decompose the faithful-reference-config frame time (VERDICT r2 item 1):
front-end vs ICP loop vs per-iteration match/solve pieces, on the real chip.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, *a, n=10, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from plo_tpu import config as cfgmod
    from plo_tpu.models import Odometry
    from plo_tpu.models.odometry import _make_icp_step, _build_match_solve
    import bench as B
    from plo_tpu.io import synthetic

    cfg = cfgmod.load("/root/reference/config.json",
                      sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4))
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
    scans, _ = B._cached_sequence(8, n_scans=64, azimuth_steps=900, speed=0.5,
                                  yaw_rate=0.005, seed=11, world=world)

    odo = Odometry(cfg, capacity=57600, seed=0, transfer="float32")
    # Warm: process 3 frames so front-end + icp are compiled and state exists.
    for s in scans[:3]:
        odo.process_scan(s)

    # ---- whole-frame sync time ----
    t0 = time.perf_counter()
    for s in scans[3:8]:
        odo.process_scan(s)
    whole = (time.perf_counter() - t0) / 5 * 1e3
    print(f"whole frame (sync): {whole:.1f} ms  -> {1e3/whole:.1f} scans/s")

    # ---- front-end alone ----
    key = odo._next_key()
    lf = odo.last_filtered

    def fe_only(raw):
        return odo.frontend.process(raw, key, lf, first_frame=False)
    r = t(lambda: fe_only(scans[4]), n=10)
    print(f"front-end (incl. H2D pack): {r:.1f} ms")

    # ---- icp_step alone (device-resident inputs) ----
    fe = odo.frontend.process(scans[4], key, lf, first_frame=False)
    flat = fe.flat
    target = odo._accumulated_target()
    jax.block_until_ready(target.xyz)
    kk = jnp.asarray([np.uint32(0), np.uint32(99)])
    r = t(lambda: odo.icp_step(flat, target, kk, None)[0], n=10)
    print(f"icp_step (30-iter while_loop, identity init): {r:.1f} ms")

    # count actual iterations
    _, iters, ncorr, conv, _probs = jax.device_get(odo.icp_step(flat, target, kk, None))
    print(f"  iterations run: {iters}, ncorr: {ncorr}, converged: {conv}")

    # ---- per-iteration pieces ----
    match, solve, prepare_target, freeze, imls_cfg = _build_match_solve(cfg)
    tgt_n, tgt_ok = prepare_target(target)

    @jax.jit
    def match_once(flat, target, tgt_n, tgt_ok):
        res = match(flat, target, tgt_n, tgt_ok)
        return res.y, res.valid

    r = t(lambda: match_once(flat, target, tgt_n, tgt_ok), n=10)
    print(f"one full IMLS match (search+eval): {r:.2f} ms")

    from plo_tpu.ops import matching
    res = match(flat, target, tgt_n, tgt_ok)
    jax.block_until_ready(res.y)

    @jax.jit
    def solve_once(src_xyz, y, nrm, valid, key):
        return solve(src_xyz, y, nrm, valid, key)

    r = t(lambda: solve_once(flat.xyz, res.y, res.normal, res.valid, kk), n=10)
    print(f"one RANSAC-5000/DRPM solve: {r:.2f} ms")

    # search vs eval split
    cache = matching.imls_search(flat, target, imls_cfg)
    jax.block_until_ready(cache[0])

    @jax.jit
    def eval_cached(flat, target, tgt_n, tgt_ok):
        res = matching.imls_project_cached(flat, target, imls_cfg, cache, tgt_n, tgt_ok)
        return res.y

    r = t(lambda: eval_cached(flat, target, tgt_n, tgt_ok), n=10)
    print(f"cached IMLS eval: {r:.2f} ms")

    r = t(lambda: matching.imls_search(flat, target, imls_cfg)[0], n=10)
    print(f"IMLS search alone: {r:.2f} ms")


if __name__ == "__main__":
    main()
