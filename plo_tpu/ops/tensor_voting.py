"""Tensor voting: saliency pre-sampling (C12) and A->B voting (C23).

Reference surface:
  * CustomTensorVoting / CustomSaliencyDataPointsFilter
    (scan_registration.cpp:334-490): encode per-point tensors from the PCA
    eigen-pairs ("aware tensor": ((l1-l2)/k) S + (l3/k) P with S = e1 e1^T,
    P = e1 e1^T + e2 e2^T; unit-ball fallback), closed-form vote over
    neighbors, decompose into surfaceness/curveness/pointness saliencies,
    label each point argmax{pointness, curveness, surfaceness} -> {1, 2, 3},
    keep non-ball points (label != 1) as candidates
    (scan_registration.cpp:1437-1442).
  * VoteForAny (imls_icp.cpp:171-296): decomposed voting from a target set to
    arbitrary query points — k-NN from the target, vote
    S_ij = w R_ij T_j R'_ij with r = x_query - x_target,
    R = I - 2 r r^T, R' = (I - r r^T / 2) R, w = exp(-||r||^2 / sigma)
    (note: / sigma, not / sigma^2 — imls_icp.cpp:220), gated by
    0 < ||r||/sigma < distance_threshold (imls_icp.cpp:212-217).

The vote accumulation math is lifted from the reference's own re-implementation
in VoteForAny (the only place the formula is spelled out in-repo; the
libpointmatcher internals are not part of this codebase). Implementation is
batched: one KNN pass + vmapped 3x3 tensor algebra, no per-point loops.

Known deviations (the tensor-voting paths are marked broken/unverified in the
reference's results matrix): `disableBallComponent` is modeled as removing the
isotropic (ball) part of each encoded tensor, and the effective per-point
normal after voting is the max-eigenvector of the voted tensor (the stick
direction — what the reference effectively consumes through the
"normal-is-actually-tangent" descriptor workaround it warns about,
scan_registration.cpp:1426-1434).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from plo_tpu.cloud import PointCloud
from plo_tpu.config import TensorVotingConfig, IMLSTensorVotingConfig
from plo_tpu.ops import neighbors
from plo_tpu.ops.eigh3 import eigh3_descending


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SaliencyResult:
    cloud: PointCloud          # normals/curvature replaced by voted values
    candidates: jnp.ndarray    # [P] bool — non-ball points (label != 1)
    labels: jnp.ndarray        # [P] i32 in {0: invalid, 1: point, 2: curve, 3: surface}
    surfaceness: jnp.ndarray   # [P]
    curveness: jnp.ndarray     # [P]
    pointness: jnp.ndarray     # [P]
    eigvecs: jnp.ndarray       # [P, 3, 3] voted-tensor eigenvectors (desc cols)

    def descriptors(self) -> jnp.ndarray:
        """The reference's 22-row DataPoints descriptor block (the hand-rolled
        serialization layout of saver.cpp:135-306 / SURVEY.md C6):
        rows 0-2 surfaceness/curveness/pointness, 3-5 normals, 6-8 tangents,
        9 labels, 10-13 sticks (saliency + tail), 14-20 plates (saliency +
        2 tails), 21 balls. Returns [22, P]."""
        e1 = self.eigvecs[:, :, 0].T      # stick tail (max eigvec)
        e2 = self.eigvecs[:, :, 1].T
        e3 = self.eigvecs[:, :, 2].T
        return jnp.concatenate([
            self.surfaceness[None, :], self.curveness[None, :], self.pointness[None, :],
            e3,                            # "normals" rows (min eigvec)
            e1,                            # "tangents" rows — the field the
                                           # reference actually consumes as
                                           # the normal (its libpointmatcher
                                           # bug note, scan_registration.cpp:1426)
            self.labels[None, :].astype(jnp.float32),
            self.surfaceness[None, :], e1,             # sticks: saliency + tail
            self.curveness[None, :], e1, e2,           # plates: saliency + tails
            self.pointness[None, :],                   # balls
        ], axis=0)


@jax.jit
def encode_aware_tensors(eigvals: jnp.ndarray, eigvecs: jnp.ndarray, k: float) -> jnp.ndarray:
    """Aware-tensor encoding (scan_registration.cpp:362-388). eigvals [P, 3]
    descending (abs applied as the reference does), eigvecs [P, 3, 3] with
    descending-order columns."""
    va = jnp.abs(eigvals)
    l1 = jnp.max(va, axis=-1)
    l3 = jnp.min(va, axis=-1)
    l2 = jnp.sum(va, axis=-1) - l1 - l3
    e1 = eigvecs[:, :, 0]
    e2 = eigvecs[:, :, 1]
    S = jnp.einsum("pi,pj->pij", e1, e1)
    P = S + jnp.einsum("pi,pj->pij", e2, e2)
    T = ((l1 - l2) / k)[:, None, None] * S + (l3 / k)[:, None, None] * P
    # Unit-ball fallback for non-finite eigen-data.
    bad = ~jnp.all(jnp.isfinite(va), axis=-1)
    eye = jnp.broadcast_to(jnp.eye(3), T.shape)
    return jnp.where(bad[:, None, None], eye, T)


def remove_ball_component(T: jnp.ndarray) -> jnp.ndarray:
    """disableBallComponent analog: subtract the isotropic part
    (min-eigenvalue * I) of each tensor."""
    w, _ = eigh3_descending(T)
    return T - w[:, 2, None, None] * jnp.broadcast_to(jnp.eye(3), T.shape)


def _vote_kernel(r: jnp.ndarray, T_voter: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """One vote S = w R T R' for receiver-voter offsets r [..., 3] and voter
    tensors T [..., 3, 3] (imls_icp.cpp:219-224)."""
    d2 = jnp.sum(r * r, axis=-1)
    rn = r / jnp.maximum(jnp.sqrt(d2), 1e-12)[..., None]
    rrT = jnp.einsum("...i,...j->...ij", rn, rn)
    eye = jnp.broadcast_to(jnp.eye(3), rrT.shape)
    R = eye - 2.0 * rrT
    Rp = (eye - 0.5 * rrT) @ R
    w = jnp.exp(-d2 / sigma)  # reference: exp(-||r||^2 / sigma), imls_icp.cpp:220
    return w[..., None, None] * (R @ T_voter @ Rp)


@partial(jax.jit, static_argnames=("k",))
def cast_votes(query_xyz: jnp.ndarray, query_valid: jnp.ndarray,
               voter_xyz: jnp.ndarray, voter_valid: jnp.ndarray,
               voter_tensors: jnp.ndarray, k: int, sigma: float,
               distance_threshold: float = jnp.inf,
               exclude_self: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accumulate k-NN votes from `voter` points onto `query` points.

    Returns (voted tensors [Q, 3, 3], received_any [Q] bool). Votes are gated
    by 0 < ||r||/sigma < distance_threshold (imls_icp.cpp:212-217)."""
    d2, idx, ok = neighbors.knn(query_xyz, voter_xyz, voter_valid, k=k)
    idx_c = jnp.clip(idx, 0, voter_xyz.shape[0] - 1)
    r = query_xyz[:, None, :] - voter_xyz[idx_c]          # receiver - voter
    dist_sig = jnp.sqrt(jnp.maximum(d2, 0.0)) / sigma
    gate = ok & (dist_sig > 0.0) & (dist_sig < distance_threshold)
    if exclude_self:
        gate = gate & (d2 > 1e-20)
    votes = _vote_kernel(r, voter_tensors[idx_c], sigma)   # [Q, k, 3, 3]
    votes = jnp.where(gate[..., None, None], votes, 0.0)
    acc = jnp.sum(votes, axis=1)
    received = query_valid & jnp.any(gate, axis=1)
    return acc, received


@jax.jit
def decompose(T: jnp.ndarray):
    """Saliency decomposition: surfaceness = l1-l2, curveness = l2-l3,
    pointness = l3; stick direction = max eigenvector; labels by argmax
    (scan_registration.cpp:416-428)."""
    w, V = eigh3_descending(T)
    surfaceness = w[:, 0] - w[:, 1]
    curveness = w[:, 1] - w[:, 2]
    pointness = w[:, 2]
    stick = V[:, :, 0]
    coeff = jnp.stack([pointness, curveness, surfaceness], axis=1)
    labels = jnp.argmax(coeff, axis=1).astype(jnp.int32) + 1
    return surfaceness, curveness, pointness, stick, labels


def saliency_presample(cloud: PointCloud, eigvecs: jnp.ndarray,
                       cfg: TensorVotingConfig) -> SaliencyResult:
    """C12: the tensor-voting pre-sampling stage (applySaliencyFilter +
    candidate selection, scan_registration.cpp:455-490, 1409-1446)."""
    T_in = encode_aware_tensors(cloud.eigvals, eigvecs, float(cfg.k))
    T_in = remove_ball_component(T_in)
    voted, received = cast_votes(cloud.xyz, cloud.valid, cloud.xyz, cloud.valid,
                                 T_in, cfg.k, cfg.sigma)
    surfaceness, curveness, pointness, stick, labels = decompose(voted)
    _, voted_vecs = eigh3_descending(voted)

    # +z hemisphere flip of the effective normal (scan_registration.cpp:1425-1434).
    normal = stick * jnp.where(stick[:, 2:3] < 0, -1.0, 1.0)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nn, 1e-12)

    valid = cloud.valid & received
    labels = jnp.where(valid, labels, 0)
    out = dataclasses.replace(
        cloud,
        normal=jnp.where(valid[:, None], normal, 0.0),
        # convertDataPointsToPointCloud stores surfaceness into curvature
        # (common.h:96-99).
        curvature=jnp.where(valid, surfaceness, 0.0),
        valid=valid,
    )
    candidates = valid & (labels != 1)
    return SaliencyResult(cloud=out, candidates=candidates, labels=labels,
                          surfaceness=surfaceness, curveness=curveness,
                          pointness=pointness, eigvecs=voted_vecs)


def vote_for_any(target_xyz: jnp.ndarray, target_valid: jnp.ndarray,
                 target_normal: jnp.ndarray, query_xyz: jnp.ndarray,
                 query_valid: jnp.ndarray, cfg: IMLSTensorVotingConfig):
    """C23: supply normals for arbitrary query points by voting from the
    target cloud (VoteForAny, imls_icp.cpp:171-296).

    Target tensors are stick tensors from the target normals (the AWARE_TENSOR
    encoding of a surface-dominant cloud); the query normal is the voted stick
    direction, flipped into the +z hemisphere (imls_icp.cpp:271-276).
    Returns (normals [Q, 3], ok [Q])."""
    T_t = jnp.einsum("pi,pj->pij", target_normal, target_normal)
    voted, received = cast_votes(query_xyz, query_valid, target_xyz, target_valid,
                                 T_t, cfg.k, cfg.sigma,
                                 distance_threshold=cfg.distance_threshold)
    _, _, _, stick, _ = decompose(voted)
    normal = stick * jnp.where(stick[:, 2:3] < 0, -1.0, 1.0)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nn, 1e-12)
    ok = received
    return jnp.where(ok[:, None], normal, 0.0), ok
