"""Multi-process runtime entry (jax.distributed).

The reference's entire distributed story is one ROS process boundary between
the front-end and back-end nodes (scan_registration.cpp:1592-1606 ->
laser_odometry.cpp:699-706, TCPROS pub/sub). The TPU-native replacement is
the standard JAX multi-controller model: one Python process per host, all
processes participating in every global (sharded) computation, with
cross-host traffic carried by XLA collectives — ICI within a slice, DCN/gloo
across hosts — never by a hand-rolled transport.

This module is the process-boundary entry point:

  * `initialize()` wires the process into the cluster
    (`jax.distributed.initialize`). On real TPU pods every argument is
    auto-detected from the environment; on CPU (tests, CI) pass
    coordinator/num_processes/process_id explicitly and collectives run over
    gloo — the same code path `tests/test_distributed.py` exercises with
    2 processes x 4 virtual devices each.
  * `global_mesh()` builds a mesh over ALL processes' devices.
  * `barrier()` synchronizes all processes (used around checkpoint/restart).

Every placement in plo_tpu.parallel is multi-process-safe: device state is
created by jitted programs with explicit `out_shardings` (never by
`jax.device_put` of host-global arrays onto non-addressable devices), and
host inputs enter global programs as process-uniform numpy arrays.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None,
               platform: Optional[str] = None) -> Tuple[int, int]:
    """Join the multi-process cluster; returns (process_count, process_index).

    Must be called before any JAX computation. On TPU pods, call with no
    arguments (everything is auto-detected). For CPU multi-process (tests,
    development), pass coordinator_address ("host:port"), num_processes, and
    process_id, plus local_device_count to carve N virtual CPU devices per
    process, and platform="cpu".
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        flags = " ".join(f for f in flags.split()
                         if "xla_force_host_platform_device_count" not in f)
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={local_device_count}"
        ).strip()
    if platform is not None:
        os.environ["JAX_PLATFORMS"] = platform

    import jax
    if platform is not None:
        # Some launch environments pin jax_platforms at the config level,
        # overriding the env var (see tests/conftest.py) — set both.
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count(), jax.process_index()


def global_mesh(axis_name: str = "points"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis_name,))


def barrier(name: str = "plo_barrier") -> None:
    """Block until all processes reach this point (a psum over the cluster)."""
    import jax
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def shutdown() -> None:
    import jax
    jax.distributed.shutdown()
