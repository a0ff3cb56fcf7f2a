"""Device-mesh sharding for the odometry pipeline.

Parallel decomposition (SURVEY.md §2.3): the source-point dimension shards
over the mesh's 'points' axis — anchor search, rejection cascade, IMLS
accumulation, and the [N, 6] system build are all per-source-point maps, so
under GSPMD each device holds its slice of the source cloud against a
replicated target model, and the only cross-device traffic is the psum of the
6x6 / 6-vector normal-equation reductions inside the solve (plus scalar
convergence flags). This mirrors how the scaling-book recipe applies here:
annotate shardings at the jit boundary, let XLA insert the collectives, and
keep them on ICI.

The target/map cloud is replicated at this stage; the sharded map-block store
(each host owning voxel blocks, halo-exchanged queries) is the next scale-out
stage and lives in parallel/map_store.py once built.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plo_tpu.cloud import PointCloud
from plo_tpu.config import Config


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_cloud(cloud: PointCloud, mesh: Mesh, axis_name: str = "points") -> PointCloud:
    """Shard every per-point array over the mesh's point axis."""
    def put(x):
        spec = P(axis_name) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, cloud)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def make_sharded_icp_step(cfg: Config, mesh: Mesh, axis_name: str = "points"):
    """The back-end ICP loop jitted over a mesh: source cloud sharded on the
    point dimension, target replicated, delta pose replicated out.

    Returns a function (flat: PointCloud, target: PointCloud, key) ->
    (rPose, iters, n_corr, converged); inputs may be host arrays — they are
    placed with the right shardings on entry.
    """
    from plo_tpu.models.odometry import _make_icp_step

    icp = _make_icp_step(cfg)
    point_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def shardings_for_cloud(template: PointCloud):
        return PointCloud(
            xyz=point_sharding, normal=point_sharding, intensity=point_sharding,
            curvature=point_sharding, eigvals=point_sharding, valid=point_sharding,
        )

    def run(flat: PointCloud, target: PointCloud, key):
        flat = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, point_sharding), flat)
        target = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), target)
        key = jax.device_put(key, repl)
        return icp(flat, target, key)

    return run


def get_mesh_2d(n_hosts: int, chips_per_host: int,
                axes=("hosts", "chips")) -> Mesh:
    """Two-level mesh modeling a multi-slice pod: the 'hosts' axis maps to
    DCN (across slices) and 'chips' to ICI (within a slice). Shardings that
    put the point dimension over ('hosts', 'chips') keep the heavy all-to-one
    reductions hierarchical: XLA reduces within a slice over ICI first, then
    across slices over DCN."""
    devs = np.array(jax.devices()[: n_hosts * chips_per_host]).reshape(
        n_hosts, chips_per_host)
    return Mesh(devs, axes)


def make_sharded_icp_step_2d(cfg: Config, mesh: Mesh):
    """ICP step sharded over a (hosts, chips) mesh: source points sharded over
    BOTH axes (the flattened product), target replicated."""
    from plo_tpu.models.odometry import _make_icp_step

    icp = _make_icp_step(cfg, jit=False)
    point_sharding = NamedSharding(mesh, P(mesh.axis_names))
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(icp)

    def run(flat: PointCloud, target: PointCloud, key):
        flat = jax.tree_util.tree_map(lambda x: jax.device_put(x, point_sharding), flat)
        target = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), target)
        return jitted(flat, target, jax.device_put(key, repl))

    return run
