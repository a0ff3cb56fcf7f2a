"""Stage 3a — pre-sampling features: per-ring curvature, geometric features,
and candidate selection.

Reference parity:
  * Curvature (LOAM-style): sum of coordinate differences over a +-window of
    consecutive stored points along the flat ring-major cloud, curvature =
    ||sum diff||^2 (scan_registration.cpp:1071-1113). Our RingCloud is compact
    (valid points form a prefix in ring-major order), so flat-index windows
    match the reference's exactly.
  * Geometric features from PCA eigenvalues: sum, omnivariance, eigenentropy,
    anisotropy, linearity, planarity, surface variation, sphericity;
    candidates = planarity > threshold (scan_registration.cpp:279-327).
  * Curvature presample: candidates = curvature > threshold (:1462-1473).
Tensor-voting pre-sampling lives in ops/tensor_voting.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from plo_tpu.ops.preprocess import RingCloud


@partial(jax.jit, static_argnames=("window_size",))
def ring_curvature(cloud: RingCloud, window_size: int) -> jnp.ndarray:
    """Per-point curvature over +-window_size consecutive stored points.

    Replicates scan_registration.cpp:1075-1112: the window runs over flat
    indices (it may straddle ring boundaries near ring edges, a reference
    quirk kept as-is); points with flat index < w or >= size - w, or with
    ring-position outside [5, size-6), keep curvature 0.
    """
    cap = cloud.capacity
    idx = jnp.arange(cap, dtype=jnp.int32)
    total = jnp.sum(cloud.valid.astype(jnp.int32))  # compact prefix length

    acc = jnp.zeros_like(cloud.xyz)
    n_terms = jnp.zeros((cap, 1), jnp.float32)
    for k in range(-window_size, window_size + 1):
        j = idx + k
        ok = (j >= 0) & (j < total)
        jc = jnp.clip(j, 0, cap - 1)
        acc = acc + jnp.where(ok[:, None], cloud.xyz[jc], 0.0)
        n_terms = n_terms + ok[:, None].astype(jnp.float32)

    diff = acc - n_terms * cloud.xyz  # sum_k (x_{j+k} - x_j) incl. k=0 (zero)
    curv = jnp.sum(diff * diff, axis=-1)

    ring = jnp.clip(cloud.ring, 0, cloud.ring_start.shape[0] - 1)
    size = cloud.ring_count[ring]
    pos_ok = (cloud.pos_in_ring >= 5) & (cloud.pos_in_ring < size - 6)
    flat_ok = (idx >= window_size) & (idx < total - window_size)
    return jnp.where(cloud.valid & pos_ok & flat_ok, curv, 0.0)


@jax.jit
def geometric_features(eigvals: jnp.ndarray) -> jnp.ndarray:
    """The 8 eigenvalue features (scan_registration.cpp:291-319). Input is
    [P, 3] descending (lambda1 >= lambda2 >= lambda3). Returns [P, 8]:
    sum, omnivariance, eigenentropy, anisotropy, linearity, planarity,
    surface_variation, sphericity."""
    l1, l2, l3 = eigvals[:, 0], eigvals[:, 1], eigvals[:, 2]
    safe = lambda x: jnp.maximum(x, 1e-20)
    s = l1 + l2 + l3
    omni = jnp.cbrt(l1 * l2 * l3)
    entropy = -(l1 * jnp.log(safe(l1)) + l2 * jnp.log(safe(l2)) + l3 * jnp.log(safe(l3)))
    aniso = (l1 - l3) / safe(l1)
    linearity = (l1 - l2) / safe(l1)
    planarity = (l2 - l3) / safe(l1)
    surf_var = l3 / safe(s)
    sphericity = l3 / safe(l1)
    return jnp.stack([s, omni, entropy, aniso, linearity, planarity, surf_var, sphericity], axis=1)


def presample_geometric(eigvals: jnp.ndarray, valid: jnp.ndarray,
                        planarity_threshold: float) -> jnp.ndarray:
    """Candidates: planarity > threshold (scan_registration.cpp:322-326)."""
    feats = geometric_features(eigvals)
    return valid & (feats[:, 5] > planarity_threshold)


def presample_curvature(curvature: jnp.ndarray, valid: jnp.ndarray,
                        curvature_threshold: float) -> jnp.ndarray:
    """Candidates: curvature > threshold (scan_registration.cpp:1466-1470)."""
    return valid & (curvature > curvature_threshold)
