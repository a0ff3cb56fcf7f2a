"""Sharded map / keyframe store with distributed correspondence search.

New component (SURVEY.md §2.3): the reference's target model is a single
concatenated cloud on one process (accumulateTargetCloud,
laser_odometry.cpp:116-136). At scale the map shards across the mesh: each
device owns the points whose spatial hash lands on it, queries are replicated
(one all-gather-sized broadcast), every device searches only its shard, and
the per-device candidates are merged with a cross-device top-k — so the
O(Q*T) work divides by the mesh size while each merged result is exactly the
global k-NN.

Layout: [D, M, ...] arrays (device-major), sharded on axis 0. Point-to-shard
assignment uses a voxel hash (points in the same voxel land on the same
device, keeping future halo-exchange locality), with per-shard capacity M and
overflow dropped oldest-first.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plo_tpu.cloud import PointCloud
from plo_tpu.ops import neighbors


def voxel_shard_id(xyz: jnp.ndarray, n_shards: int, voxel: float = 4.0,
                   base_cell: float = None, block_factor: int = None) -> jnp.ndarray:
    """Spatial-hash shard assignment: points of one block co-locate.

    With `base_cell`/`block_factor`, the block index is derived from the
    INTEGER voxel cell (floor(xyz/base_cell) // block_factor) so block
    boundaries align EXACTLY with the voxel grid — floor(xyz/(B*cell)) in
    float splits boundary voxels across shards (measured 175 of 2086 voxels
    duplicated on one HDL-32 frame), which would break the per-shard ==
    global voxel-dedupe equivalence."""
    from plo_tpu.ops.grid_hash import hash_bucket

    if base_cell is not None:
        v = jnp.floor_divide(jnp.floor(xyz / base_cell).astype(jnp.int32),
                             block_factor)
    else:
        v = jnp.floor(xyz / voxel).astype(jnp.int32)
    return hash_bucket(v, n_shards)


@partial(jax.jit, static_argnames=("n_shards", "per_shard", "block_factor"))
def partition_cloud(cloud: PointCloud, n_shards: int, per_shard: int,
                    voxel: float = 4.0, base_cell: float = None,
                    block_factor: int = None):
    """Repartition a padded cloud into [D, M] shard-major layout.

    Returns a PointCloud whose leading dim is D*M, ordered shard-major, plus
    the per-shard counts [D]. Overflowing points are dropped."""
    shard = jnp.where(cloud.valid,
                      voxel_shard_id(cloud.xyz, n_shards, voxel, base_cell,
                                     block_factor), n_shards)
    order = jnp.argsort(shard, stable=True)
    counts = jnp.bincount(shard, length=n_shards + 1)[:n_shards]
    starts = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])

    # Destination slot of each sorted point: shard_id * per_shard + rank.
    sorted_shard = shard[order]
    rank = jnp.arange(cloud.capacity) - starts[jnp.clip(sorted_shard, 0, n_shards - 1)]
    ok = (sorted_shard < n_shards) & (rank < per_shard)
    dest = jnp.where(ok, sorted_shard * per_shard + rank, n_shards * per_shard)

    def scatter(x, fill=0.0):
        out_shape = (n_shards * per_shard + 1,) + x.shape[1:]
        out = jnp.full(out_shape, fill, x.dtype)
        return out.at[dest].set(x[order])[:-1]

    out = PointCloud(
        xyz=scatter(cloud.xyz),
        normal=scatter(cloud.normal),
        intensity=scatter(cloud.intensity),
        curvature=scatter(cloud.curvature),
        eigvals=scatter(cloud.eigvals),
        valid=scatter(cloud.valid, fill=False),
    )
    return out, jnp.minimum(counts, per_shard)


class ShardedMapStore:
    """Device-sharded target model + distributed k-NN."""

    def __init__(self, mesh: Mesh, per_shard: int, voxel: float = 4.0,
                 axis_name: str = "points"):
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_shards = int(mesh.devices.size)
        self.per_shard = per_shard
        self.voxel = voxel
        self.cloud: PointCloud | None = None  # [D*M] shard-major
        self._shard_spec = NamedSharding(mesh, P(axis_name))
        self._repl = NamedSharding(mesh, P())
        # Multi-process-safe placements: jitted identity/partition programs
        # with explicit out_shardings. `jax.device_put(host_array, sharding)`
        # fails on a multi-process mesh (the target devices are not all
        # addressable from this process); a jitted program with
        # out_shardings works identically in both regimes — host inputs are
        # treated as process-uniform (every process passes the same value).
        self._to_repl = jax.jit(lambda t: t, out_shardings=self._repl)
        self._to_shard = jax.jit(lambda t: t, out_shardings=self._shard_spec)
        self._partition = jax.jit(
            lambda c: partition_cloud(c, self.n_shards, self.per_shard, self.voxel),
            out_shardings=(self._shard_spec, self._repl))

    def set_model(self, cloud: PointCloud):
        """Partition + place the model cloud (replaces accumulateTargetCloud)."""
        self.cloud, counts = self._partition(cloud)
        return counts

    @partial(jax.jit, static_argnames=("self", "k"))
    def _query(self, query_xyz: jnp.ndarray, cloud_xyz, cloud_valid, k: int):
        # NOTE: the cloud arrays are explicit arguments — `self` is a static
        # jit arg, so anything read off it at trace time (self.cloud) would be
        # baked into the compiled program as a CONSTANT and every later query
        # would silently search the map as of the first trace.
        from jax import shard_map

        d, m = self.n_shards, self.per_shard

        def local(q, xyz_s, valid_s):
            # Each device: exact kNN against its own shard.
            d2, idx, ok = neighbors.knn(q, xyz_s, valid_s, k=k,
                                        chunk=min(8192, m))
            rank = jax.lax.axis_index(self.axis_name)
            gidx = jnp.where(ok, rank * m + idx, -1)
            # Merge across devices: gather all shards' candidates, re-top-k.
            all_d2 = jax.lax.all_gather(d2, self.axis_name)    # [D, Q, k]
            all_gi = jax.lax.all_gather(gidx, self.axis_name)
            qn = q.shape[0]
            cat_d2 = jnp.moveaxis(all_d2, 0, 1).reshape(qn, d * k)
            cat_gi = jnp.moveaxis(all_gi, 0, 1).reshape(qn, d * k)
            neg, pos = jax.lax.top_k(-cat_d2, k)
            return -neg, jnp.take_along_axis(cat_gi, pos, axis=1)

        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(self.axis_name), P(self.axis_name)),
            out_specs=(P(), P()),
            # The knn scan carries start unvarying and become varying over the
            # shard axis; skip the varying-manual-axes check.
            check_vma=False,
        )
        return fn(query_xyz, cloud_xyz, cloud_valid)

    def knn(self, query_xyz, k: int, radius: float = np.inf):
        """Global-exact k-NN against the sharded model.
        Returns (d2 [Q, k], global idx [Q, k] into the shard-major cloud,
        valid [Q, k])."""
        q = self._to_repl(query_xyz)
        d2, gidx = self._query(q, self.cloud.xyz, self.cloud.valid, k)
        valid = (gidx >= 0) & (d2 <= radius**2) & jnp.isfinite(d2)
        return d2, gidx, valid

    @partial(jax.jit, static_argnames=("self", "k"))
    def _query_gather(self, query_xyz: jnp.ndarray, cloud_xyz, cloud_nrm,
                      cloud_valid, k: int):
        # Cloud arrays are explicit args — see the _query trace-constant note.
        from jax import shard_map

        m = self.per_shard

        def local(q, xyz_s, nrm_s, valid_s):
            # Each device: exact kNN against its own shard, then gather the
            # winning rows LOCALLY so the merge ships candidates, not the map.
            d2, idx, ok = neighbors.knn(q, xyz_s, valid_s, k=k,
                                        chunk=min(8192, m))
            idx_c = jnp.clip(idx, 0, m - 1)
            normal_ok = valid_s & (jnp.sum(nrm_s * nrm_s, axis=-1) > 1e-12)
            packed = jnp.concatenate(
                [xyz_s, nrm_s, normal_ok.astype(jnp.float32)[:, None]], axis=1)
            rows = packed[idx_c]                               # [Q, k, 7]
            d2 = jnp.where(ok, d2, jnp.inf)
            # Merge across devices: one all_gather of the candidate rows
            # ([D, Q, k, 7] — the only cross-device traffic), then re-top-k.
            all_d2 = jax.lax.all_gather(d2, self.axis_name)    # [D, Q, k]
            all_rows = jax.lax.all_gather(rows, self.axis_name)
            qn = q.shape[0]
            cat_d2 = jnp.moveaxis(all_d2, 0, 1).reshape(qn, -1)
            cat_rows = jnp.moveaxis(all_rows, 0, 1).reshape(qn, cat_d2.shape[1], 7)
            neg, pos = jax.lax.top_k(-cat_d2, k)
            best = jnp.take_along_axis(cat_rows, pos[..., None], axis=1)
            return -neg, best

        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(self.axis_name), P(self.axis_name), P(self.axis_name)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(query_xyz, cloud_xyz, cloud_nrm, cloud_valid)

    def knn_gather(self, query_xyz, k: int, radius: float = np.inf):
        """Distributed k-NN that returns the candidates THEMSELVES — the
        sharded correspondence search (SURVEY.md §2.3): each device searches
        its map shard, gathers its winners' xyz/normal locally, and a single
        all_gather of [D, Q, k, 7] candidate rows replaces any halo exchange
        of map blocks. Returns (d2 [Q,k], xyz [Q,k,3], normal [Q,k,3],
        normal_ok [Q,k], valid [Q,k]) — exactly what
        matching.imls_project_candidates consumes; the global map is never
        materialized on one device."""
        q = self._to_repl(query_xyz)
        d2, rows = self._query_gather(q, self.cloud.xyz, self.cloud.normal,
                                      self.cloud.valid, k)
        valid = jnp.isfinite(d2) & (d2 <= radius**2)
        return (d2, rows[..., 0:3], rows[..., 3:6],
                rows[..., 6] > 0.5, valid)
