"""CLI end-to-end: the user-facing entry point (replaces roslaunch)."""
import json
import os
import subprocess
import sys


def test_cli_synthetic_run(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "plo_tpu.cli",
         "--dataset", "synthetic", "--frames", "3", "--platform", "cpu",
         "--capacity", "32768", "--scan-lines", "64",
         "--output", str(tmp_path), "--eval-gt", "--save-artifacts"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # Trajectory + metrics written.
    assert (tmp_path / "trajectory_tum.txt").exists()
    lines = (tmp_path / "trajectory_tum.txt").read_text().strip().split("\n")
    assert len(lines) == 3 and len(lines[0].split()) == 8
    metrics = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().strip().split("\n")]
    assert len(metrics) == 3
    assert "correspondences" in metrics[0]
    # Artifacts in reference formats.
    assert (tmp_path / "pcl_cloud" / "000000.txt").exists()
    assert (tmp_path / "pca_markers" / "000000.obj").exists()
    assert (tmp_path / "imls_results.txt").exists()
    # ATE JSON line on stdout.
    ate_line = [l for l in out.stdout.strip().split("\n") if l.startswith("{")][-1]
    assert "ate_m" in json.loads(ate_line)
