"""Perf-floor regression (VERDICT r4 next-round #1): the faithful-config
throughput published in BASELINE.md must stay reproducible — a framework
whose own BASELINE understates (or overstates) it is broken instrumentation.

Runs `tools/bench_faithful.py --driver batched` in a subprocess with the
conftest's CPU pin removed so it reaches the real chip; skipped when no TPU
is attached (CI on CPU hosts). The floor is 24 scans/s against the published
~28 (rolled-arc kd round-5 default): the documented ±20% axon-link session
drift (BASELINE.md measurement discipline #3) must not trip it.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _chip_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    return env


@pytest.mark.slow
def test_faithful_perf_floor_on_chip():
    env = _chip_env()
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.default_backend())"],
        env=env, capture_output=True, text=True, timeout=300)
    if probe.returncode != 0 or "tpu" not in probe.stdout:
        pytest.skip(f"no TPU chip attached ({probe.stdout.strip()!r})")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_faithful.py"),
         "--driver", "batched"],
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "scans_per_sec_faithful_batched"
    assert rec["value"] >= 24.0, (
        f"faithful-config throughput regressed to {rec['value']} scans/s "
        "(published ~28, floor 24.0 = published minus link drift)")
