"""A/B the round-4 faithful-path kernels (Pallas cylinder, fused kd+window
gather) by running the SAME end-to-end benchmark in back-to-back subprocesses
with the kernel toggles flipped — the only comparison that survives this
tunnel's minute-scale bandwidth drift. Each run: warm batch + 3 sync-bounded
16-scan windows (bench_faithful protocol); the persistent compile cache makes
repeat warms cheap."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, %(repo)r)
from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
import bench as B
cfg = cfgmod.load("/root/reference/config.json",
                  sensor=cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4))
world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = B._cached_sequence(113, n_scans=64, azimuth_steps=900, speed=0.5,
                              yaw_rate=0.005, seed=11, world=world)
batch = 8
odo = Odometry(cfg, capacity=57600, seed=0, async_mode=True, transfer="float32")
odo.process_scans(scans[:1 + batch], batch=batch)
odo.finalize()
rates = []
i = 1 + batch
for w in range(3):
    t0 = time.perf_counter()
    odo.process_scans(scans[i:i + 16], batch=batch)
    odo.sync()
    rates.append(16 / (time.perf_counter() - t0))
    i += 16
odo.finalize()
print("RESULT", sorted(rates)[1])
'''


def run(label, env_extra):
    env = dict(os.environ, **env_extra)
    out = subprocess.run([sys.executable, "-u", "-c", WORKER % {"repo": REPO}],
                         env=env, capture_output=True, text=True, timeout=2000)
    rate = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rate = float(line.split()[1])
    if rate is None:
        print(f"{label}: FAILED\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")
    else:
        print(f"{label}: {rate:.1f} scans/s", flush=True)
    return rate


def run_retry(label, env_extra, tries=2):
    for t in range(tries):
        try:
            r = run(label if t == 0 else f"{label} (retry)", env_extra)
        except subprocess.TimeoutExpired:
            print(f"{label}: TIMEOUT (tunnel stall)", flush=True)
            r = None
        if r is not None:
            return r
    return None


def main():
    # Interleave the arms so link drift averages out of the comparison.
    # Round-4 run: XLA paths 18.5/18.6 vs both new kernels 15.6/15.7 —
    # kernels made opt-in. Round-5 re-run (after hybrid refresh + staged
    # RANSAC shrank the ICP side): pallas_cylinder 21.0/19.1 vs xla 19.2/16.9
    # vs fused_kd 13.8/12.7 — pallas cylinder became the TPU default
    # (ops/sampling.py::_PALLAS_CYLINDER); fused_kd stays opt-in-off.
    results = {}
    arms = [("two_gather_kd", {"PLO_ROLLED_KD": "0"}),
            ("rolled_exact_window", {"PLO_ROLLED_WINDOW": "exact"}),
            ("rolled_masked_window", {"PLO_ROLLED_WINDOW": "masked"})]
    for rnd in range(2):
        for name, env in arms:
            results.setdefault(name, []).append(run_retry(f"{name} (r{rnd})", env))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
