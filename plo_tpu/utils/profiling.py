"""Wall-clock stage timing + structured per-frame metrics.

TicToc mirrors the reference's stopwatch (tic_toc.h:8-42) including the
`tocAndLog` append-to-text-file format, so timing files stay comparable
("<step>: <ms> ms"). MetricsLog adds what the reference lacks: structured
per-frame JSONL records (counters, residuals, timings).
"""
from __future__ import annotations

import json
import time
from typing import Any, Dict, Optional


class TicToc:
    def __init__(self):
        self.tic()

    def tic(self):
        self._start = time.perf_counter()

    def toc(self) -> float:
        return (time.perf_counter() - self._start) * 1000.0

    def toc_and_log(self, step_name: str, filename: str) -> float:
        ms = self.toc()
        with open(filename, "a") as f:
            f.write(f"{step_name}: {ms:.3f} ms\n")
        return ms


class MetricsLog:
    """Append-mode JSONL metrics writer (one dict per frame)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records = []

    def log(self, record: Dict[str, Any]):
        self.records.append(record)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")


class DeviceTrace:
    """jax.profiler trace context — the deep-tracing complement to TicToc
    (SURVEY.md §5 tracing subsystem): writes a TensorBoard-compatible device
    trace of everything executed inside the context.

    Usage:
        with DeviceTrace("/tmp/trace"):
            odo.process_scan(scan)
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax
        jax.profiler.stop_trace()
        return False
