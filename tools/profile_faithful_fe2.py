"""Faithful front-end decomposition by PROGRAM DIFFERENCING (round 4).

Isolated devtime micro-stages disagree with the trusted end-to-end walls
(an isolated PCA stage measured ~7x the whole compiled front-end — XLA
fusion context dominates), so this tool times only FULL compiled front-end
programs — the
faithful config and one-knob variants — and attributes cost by difference.
Each timing: 2 warm blocked runs, then N runs each blocked (serial device
execution; the axon tunnel RTT is amortized by N).
"""
import dataclasses
import time
import numpy as np
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models.pipeline import FrontEnd

CAP = 57600


def timeit(fn, variants, n=10, warm=2):
    """fn(x) timed over a cycle of DISTINCT inputs: the axon relay caches
    identical (program, input) dispatches (tools/probe_cache.py), so timing
    the same arguments twice measures the cache, not the chip."""
    for i in range(warm):
        jax.block_until_ready(fn(variants[i % len(variants)]))
    t0 = time.perf_counter()
    for i in range(n):
        jax.block_until_ready(fn(variants[(warm + i) % len(variants)]))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    base = cfgmod.load("/root/reference/config.json",
                       sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4))
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
    scans, _ = synthetic.synthetic_sequence(
        2, n_scans=64, azimuth_steps=900, speed=0.5, seed=11, world=world)

    pts = np.zeros((CAP, 4), np.float32)
    n0 = min(len(scans[0]), CAP)
    pts[:n0] = scans[0][:n0]
    pts1 = np.zeros((CAP, 4), np.float32)
    n1 = min(len(scans[1]), CAP)
    pts1[:n1] = scans[1][:n1]
    # 12 distinct input copies (sub-mm jitter) to defeat the relay's
    # identical-dispatch result cache.
    rng = np.random.default_rng(1)
    variants = [jnp.asarray(pts + rng.normal(0, 1e-4, pts.shape).astype(np.float32))
                for _ in range(12)]
    jax.block_until_ready(variants)
    nv = jnp.asarray(n0, jnp.int32)
    key = jax.random.PRNGKey(0)

    def run_cfg(label, cfg, last=None):
        fe = FrontEnd(cfg, CAP)
        if last is None:
            last_xyz = jnp.zeros((1, 3), jnp.float32)
            last_valid = jnp.zeros((1,), bool)
        else:
            last_xyz, last_valid = last
        fn = jax.jit(lambda p: fe.raw_fn(p, nv, key, last_xyz, None,
                                         last_valid, first_frame=False))
        ms = timeit(lambda p: fn(p).flat.xyz, variants)
        print(f"{label:55s} {ms:7.2f} ms", flush=True)
        return ms

    # Previous frame's preprocessed cloud for major_axis's cross-frame stats.
    fe0 = FrontEnd(base, CAP)
    out0 = fe0.process(pts1, key, None, first_frame=True)
    last = (out0.filtered.xyz, out0.filtered.valid)
    jax.block_until_ready(last[0])

    full = run_cfg("faithful FULL (kdtree pca + major_axis/FPS)", base, last)

    v = dataclasses.replace(base, scan_registration=dataclasses.replace(
        base.scan_registration, compute_normal_method=dataclasses.replace(
            base.scan_registration.compute_normal_method,
            pca=dataclasses.replace(base.scan_registration.compute_normal_method.pca,
                                    neighbor_scan="index"))))
    no_kd = run_cfg("  neighbor_scan=index (no ring kd-search)", v, last)

    v = dataclasses.replace(base, scan_registration=dataclasses.replace(
        base.scan_registration, sample_method=dataclasses.replace(
            base.scan_registration.sample_method, method="random")))
    no_ma = run_cfg("  sample=random (no major_axis)", v, last)

    ma_rand = dataclasses.replace(
        base.scan_registration.sample_method.major_axis,
        sampling_strategy="random")
    v = dataclasses.replace(base, scan_registration=dataclasses.replace(
        base.scan_registration, sample_method=dataclasses.replace(
            base.scan_registration.sample_method, major_axis=ma_rand)))
    no_fps = run_cfg("  major_axis strategy=random (no per-bin FPS)", v, last)

    v = dataclasses.replace(base, scan_registration=dataclasses.replace(
        base.scan_registration, compute_normal_method=cfgmod.ComputeNormalConfig(
            format="range_image", method="pca")))
    grid_pca = run_cfg("  range_image/pca (grid-stencil normals)", v, last)

    print()
    print(f"kd ring-search cost        : {full - no_kd:7.2f} ms")
    print(f"major_axis sampling cost   : {full - no_ma:7.2f} ms")
    print(f"  of which per-bin FPS     : {full - no_fps:7.2f} ms")
    print(f"pointcloud-vs-grid FE delta: {full - grid_pca:7.2f} ms")


if __name__ == "__main__":
    main()
