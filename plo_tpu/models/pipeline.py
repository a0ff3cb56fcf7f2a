"""Front-end driver — the five-stage scan-registration pipeline.

TPU re-architecture of the reference's `laserCloudHandler`
(scan_registration.cpp:809-1560): stage dispatch happens at trace time (one
fused XLA program per configured method combination) and every stage operates
on fixed-capacity masked arrays.

Stages:
  1. preprocess   (ops/preprocess.py)   — gate, rings, relTime, range image
  2. normals      (ops/normals.py)      — pca | cross_product | FALS | SRI
  3a. presample   (ops/features.py, ops/tensor_voting.py)
  3b. sample      (ops/sampling.py)     — three_axis | random | normal | major_axis
Outputs the model cloud ("/laser_cloud_filtered") and the sampled flat cloud
("/laser_cloud_flat") as masked PointClouds.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plo_tpu.cloud import PointCloud
from plo_tpu.config import Config
from plo_tpu.ops import features, normals as normals_ops, preprocess as pre_ops
from plo_tpu.ops import sampling


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrontEndOutput:
    filtered: PointCloud   # model cloud (pcl_cloud, scan_registration.cpp:1460,1504)
    flat: PointCloud       # sampled cloud (pcl_surface_cloud, :1499-1501)
    stats: Dict[str, jnp.ndarray]


_FOV = {16: (15.0, -15.0), 32: (15.0, -25.0), 64: (2.0, -24.33)}  # scan_registration.cpp:921-930

# Per-frame stats emitted by every pipeline (sorted — the batched driver packs
# them into its fused result row in this order).
STATS_KEYS = ("n_candidates", "n_filtered", "n_plane_fail", "n_preprocessed", "n_sampled")

# grid16 transfer quantization: uint16 3D range in 5 mm steps (covers 327 m;
# 0 = empty cell). Matches native.rasterize_grid16.
GRID16_SCALE = 0.005


class FrontEnd:
    """Builds and holds the jitted per-config pipeline."""

    def __init__(self, cfg: Config, capacity: int = 131072):
        self.cfg = cfg
        self.capacity = capacity
        sr = cfg.scan_registration
        self.format = sr.compute_normal_method.format
        self.normal_method = sr.compute_normal_method.method
        self.presample_method = sr.presample_method.method
        self.sample_method = sr.sample_method.method

        # Fail fast on invalid stage combinations (the reference would crash
        # or silently emit garbage at runtime; here the pipeline build is the
        # single validation point). Tensor voting consumes PCA eigen-pairs
        # (scan_registration.cpp:342-390): without a PCA stage the tensors are
        # undefined — FALS/SRI provide no eigvecs, cross_product leaves them
        # zero.
        if self.presample_method == "tensor_voting" and self.normal_method != "pca":
            raise ValueError(
                "presample_method 'tensor_voting' requires compute_normal_method "
                f"'pca' (got format={self.format!r} method={self.normal_method!r}): "
                "the saliency filter encodes each point's tensor from PCA "
                "eigen-pairs; FALS/SRI/cross_product produce none.")

        self.height = cfg.sensor.n_scans
        self.width = cfg.grid_width
        fov_up, fov_down = _FOV[cfg.sensor.n_scans]
        self._ri_engine: Optional[normals_ops.RangeImageNormals] = None
        if self.format == "range_image" and self.normal_method in ("FALS", "SRI"):
            ws = (sr.compute_normal_method.fals.window_size
                  if self.normal_method == "FALS"
                  else sr.compute_normal_method.sri.window_size)
            self._ri_engine = normals_ops.RangeImageNormals(
                self.height, self.width, fov_up, fov_down, ws)

        # Static sample-output capacity per method (SURVEY.md §7.1).
        sm = sr.sample_method
        if self.sample_method == "three_axis":
            self.sample_size = 9 * sm.three_axis.points_per_list
        elif self.sample_method == "random":
            self.sample_size = sm.random.max_points
        elif self.sample_method == "normal":
            self.sample_size = (sm.normal.azimuth_bins * sm.normal.elevation_bins
                                * sm.normal.max_points_per_bin)
        elif self.sample_method == "major_axis":
            # frame 1 falls back to `normal` binning (scan_registration.cpp:783)
            self.sample_size = max(
                sm.major_axis.max_total_points,
                sm.normal.azimuth_bins * sm.normal.elevation_bins * sm.normal.max_points_per_bin,
            )
        else:
            raise ValueError(f"invalid sample method {self.sample_method!r}")

        # Size of the filtered (model) cloud this pipeline emits: the raw
        # capacity for pointcloud layouts, H*W for grid layouts.
        self.filtered_capacity = (self.height * self.width
                                  if self.format == "range_image" else capacity)

        # unjitted; reused by the batched driver
        self.raw_fn, self.raw_grid_fn = self._build()
        self._process = jax.jit(self.raw_fn, static_argnames=("first_frame",))
        self._process_grid = jax.jit(self.raw_grid_fn, static_argnames=("first_frame",))

    # ------------------------------------------------------------------
    def _build(self):
        cfg = self.cfg
        sr = cfg.scan_registration
        cn = sr.compute_normal_method
        ri = self._ri_engine

        def grid_stage2(rng_img, xyzg, relg, occ, curv, srcg):
            """Stages 2+ of the range_image format, shared by the pointcloud
            rasterization path and the grid16 direct-transfer path."""
            hw = self.height * self.width
            grid_eigvals = jnp.zeros((hw, 3), jnp.float32)
            plane_fail = jnp.zeros((hw,), bool)
            eigvecs = None
            if self.normal_method == "FALS":
                nrm, ok = ri.fals(rng_img)
            elif self.normal_method == "SRI":
                nrm, ok = ri.sri(rng_img)
            elif self.normal_method == "pca":
                nrm, gev, eigvecs_g, keep, pfail = normals_ops.compute_normals_pca_grid(
                    xyzg, occ, cn.pca, sr.use_all_points)
                ok = keep & occ
                nrm = jnp.where(ok[..., None], nrm, 0.0)
                grid_eigvals = jnp.where(ok[..., None], gev, 0.0).reshape(hw, 3)
                plane_fail = (pfail & occ).reshape(hw)
                eigvecs = eigvecs_g.reshape(hw, 3, 3)
            else:
                raise ValueError(f"invalid normal method {self.normal_method!r}")
            ring = jnp.repeat(jnp.arange(self.height, dtype=jnp.float32), self.width)
            rel_flat = relg.reshape(hw)
            if self.presample_method == "curvature" and curv is not None:
                curv_flat = curv[srcg.reshape(hw)]
            else:
                curv_flat = jnp.zeros((hw,), jnp.float32)
            cloud = PointCloud(
                xyz=xyzg.reshape(hw, 3),
                normal=nrm.reshape(hw, 3),
                intensity=ring + 0.1 * rel_flat,
                curvature=jnp.where(ok.reshape(hw), curv_flat, 0.0),
                eigvals=grid_eigvals,
                valid=ok.reshape(hw),
            )
            return cloud, plane_fail, eigvecs

        def run(pts, n_valid, key, last_xyz, last_normal_dummy, last_valid, first_frame: bool):
            # The grid paths only rasterize — they never index by ring
            # position — so the ring-sorted compaction (a 65k argsort +
            # gathers, ~2.4 ms/scan) is skipped unless a consumer needs it
            # (pointcloud normals or the flat-window ring curvature).
            need_sorted = (self.format == "pointcloud"
                           or self.presample_method == "curvature")
            rc = pre_ops.preprocess(pts, n_valid, cfg.sensor, sort=need_sorted)

            # Stage-1 curvature (only computed for the curvature presample,
            # scan_registration.cpp:1071-1113).
            if self.presample_method == "curvature":
                curv = features.ring_curvature(rc, sr.presample_method.curvature.window_size)
            else:
                curv = jnp.zeros((self.capacity,), jnp.float32)

            # Stage 2 — normals.
            eigvecs = None
            if self.format == "pointcloud":
                if self.normal_method == "pca":
                    nres = normals_ops.compute_normals_pca(
                        rc, cn.pca, sr.use_all_points,
                        # The tensor-voting saliency cascade consumes the full
                        # eigen-pairs and is sensitive to the rolled kd path's
                        # anchor deviation — keep it on the exact form.
                        exact_kd=(self.presample_method == "tensor_voting"))
                elif self.normal_method == "cross_product":
                    nres = normals_ops.compute_normals_cross_product(rc, cn.cross_product)
                else:
                    raise ValueError(f"invalid normal method {self.normal_method!r}")
                cloud = dataclasses.replace(nres.cloud, curvature=jnp.where(nres.cloud.valid, curv, 0.0))
                plane_fail = nres.plane_fail
                eigvecs = nres.eigvecs
            elif self.format == "range_image":
                # TPU-native grid-stencil path (the pca method here is an
                # extension beyond the reference's FALS/SRI: same math as
                # pointcloud/pca, neighbor structure = the azimuth-aligned
                # grid, zero gather ops).
                rng_img, xyzg, relg, occ, srcg = pre_ops.rasterize_range_image(
                    rc, self.height, self.width)
                cloud, plane_fail, eigvecs = grid_stage2(
                    rng_img, xyzg, relg, occ,
                    curv if self.presample_method == "curvature" else None, srcg)
            else:
                raise ValueError(f"invalid data format {self.format!r}")

            return stage3(cloud, plane_fail, eigvecs, rc.valid.sum(), key,
                          last_xyz, last_valid, first_frame)

        def stage3(cloud, plane_fail, eigvecs, n_preprocessed, key,
                   last_xyz, last_valid, first_frame: bool):
            # Stage 3a — presample candidates.
            if self.presample_method == "geometric_features":
                cand = features.presample_geometric(
                    cloud.eigvals, cloud.valid,
                    sr.presample_method.geometric_features.planarity_threshold)
            elif self.presample_method == "curvature":
                cand = features.presample_curvature(
                    cloud.curvature, cloud.valid,
                    sr.presample_method.curvature.curvature_threshold)
            elif self.presample_method == "tensor_voting":
                from plo_tpu.ops import tensor_voting as tv_ops
                tv = tv_ops.saliency_presample(
                    cloud, eigvecs, sr.presample_method.tensor_voting)
                cloud = tv.cloud
                cand = tv.candidates
            else:
                raise ValueError(f"invalid presample method {self.presample_method!r}")

            # use_all_points keeps plane-fail points in the model cloud but
            # bars them from sampling (scan_registration.cpp:1481-1489).
            if sr.use_all_points:
                cand = cand & ~plane_fail

            # Stage 3b — sampling.
            sm = sr.sample_method
            if self.sample_method == "three_axis":
                idx, ivalid = sampling.three_axis_sampling(
                    cloud.xyz, cloud.normal, cloud.eigvals, cand,
                    sm.three_axis.points_per_list)
            elif self.sample_method == "random":
                idx, ivalid = sampling.random_sampling(cand, key, sm.random.max_points)
            elif self.sample_method == "normal" or (self.sample_method == "major_axis" and first_frame):
                n = sm.normal
                idx, ivalid = sampling.normal_sampling(
                    cloud.normal, cand, key, n.azimuth_bins, n.elevation_bins,
                    n.min_points_per_bin, n.max_points_per_bin, self.sample_size,
                    strategy=n.sampling_strategy, xyz=cloud.xyz)
            elif self.sample_method == "major_axis":
                ma = sm.major_axis
                idx, ivalid = sampling.major_axis_sampling(
                    cloud.xyz, cloud.normal, cand, last_xyz, last_valid, key,
                    ma.r, ma.r_proj, ma.max_total_points, ma.azimuth_bins,
                    ma.elevation_bins, ma.min_points_per_bin,
                    ma.max_points_per_bin, self.sample_size,
                    strategy=ma.sampling_strategy)
            else:
                raise ValueError(f"invalid sample method {self.sample_method!r}")

            flat = cloud.gather(idx, ivalid)
            stats = {
                "n_preprocessed": n_preprocessed,
                "n_filtered": cloud.valid.sum(),
                "n_candidates": cand.sum(),
                "n_sampled": flat.valid.sum(),
                "n_plane_fail": plane_fail.sum(),
            }
            return FrontEndOutput(filtered=cloud, flat=flat, stats=stats)

        def run_grid(grid_u16, key, last_xyz, last_valid, first_frame: bool):
            """grid16 direct-transfer entry: the scan arrives as a
            [H, W] uint16 quantized-3D-range grid (0 = empty; the raster the
            sensor fires on), so ring assignment, relTime recovery, and the
            scatter rasterization all vanish — xyz is reconstructed as
            r * dir(ring, col) from the beam table, and the range image the
            reference stores (2D range, scan_registration.cpp:943) is
            r * cos(elevation)."""
            r3d = grid_u16.astype(jnp.float32) * GRID16_SCALE
            occ = grid_u16 > 0
            dirs, cos_e = self._grid_dirs()
            xyzg = r3d[..., None] * dirs
            rng_img = jnp.where(occ, r3d * cos_e, jnp.inf)
            relg = jnp.broadcast_to(
                jnp.arange(self.width, dtype=jnp.float32)[None, :] / self.width,
                (self.height, self.width))
            cloud, plane_fail, eigvecs = grid_stage2(
                rng_img, xyzg, relg, occ, None, None)
            return stage3(cloud, plane_fail, eigvecs,
                          occ.sum(), key, last_xyz, last_valid, first_frame)

        return run, run_grid

    # ------------------------------------------------------------------
    def _grid_dirs(self):
        """Unit ray directions [H, W, 3] + per-ring cos(elevation) [H, 1] for
        the grid16 raster (azimuth = clockwise from +x per column, the -atan2
        convention of scan_registration.cpp:901).

        The elevation table is ring_elevation_table — exactly the ring model
        the rasterizer BINNED with (the 27-entry VLP-32C quirk table for 32
        beams, not the physical 32-beam sensor model): packing and
        reconstruction must invert the same map (tests/test_odometry.py::
        test_grid16_16_and_32_beam_e2e)."""
        elev = jnp.deg2rad(jnp.asarray(
            pre_ops.ring_elevation_table(self.height)))          # [H]
        az = -2.0 * jnp.pi * jnp.arange(self.width, dtype=jnp.float32) / self.width
        cos_e = jnp.cos(elev)[:, None]
        dirs = jnp.stack([
            cos_e * jnp.cos(az)[None, :],
            cos_e * jnp.sin(az)[None, :],
            jnp.broadcast_to(jnp.sin(elev)[:, None], (self.height, self.width)),
        ], axis=-1)
        return dirs, cos_e

    def process_grid(self, grid_u16: np.ndarray, key,
                     first_frame: bool, last_filtered: Optional[PointCloud] = None
                     ) -> FrontEndOutput:
        """Run the pipeline on one grid16-packed scan [H, W] uint16."""
        if last_filtered is None:
            last_xyz = jnp.zeros((1, 3), jnp.float32)
            last_valid = jnp.zeros((1,), bool)
        else:
            last_xyz = last_filtered.xyz
            last_valid = last_filtered.valid
        return self._process_grid(jnp.asarray(grid_u16), key, last_xyz,
                                  last_valid, first_frame=first_frame)

    def process(self, raw_pts: np.ndarray, key, last_filtered: Optional[PointCloud],
                first_frame: bool) -> FrontEndOutput:
        """Run the pipeline on one raw scan [N, >=3] (numpy, variable length)."""
        pts = np.zeros((self.capacity, 4), np.float32)
        n = min(len(raw_pts), self.capacity)
        pts[:n, : raw_pts.shape[1]] = raw_pts[:n, :4]
        if last_filtered is None:
            last_xyz = jnp.zeros((1, 3), jnp.float32)
            last_valid = jnp.zeros((1,), bool)
        else:
            last_xyz = last_filtered.xyz
            last_valid = last_filtered.valid
        return self._process(jnp.asarray(pts), jnp.asarray(n, jnp.int32), key,
                             last_xyz, None, last_valid, first_frame=first_frame)
