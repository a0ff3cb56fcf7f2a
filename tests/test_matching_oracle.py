"""Oracle-grade matching tests (VERDICT r1 item 6): independent float64 NumPy
re-derivations of the reference's full rejection cascades, compared against
the jitted f32 kernels on IRREGULAR random clouds.

Oracles are transcribed from the reference semantics:
  * IMLS ProjSourcePtToSurface + ImplicitMLSFunction
    (imls_icp.cpp:496-745, :301-483): anchor search, h-gate, invalid-normal,
    angle gate, per-neighbor gates, the adaptive bandwidth
    h_max = sqrt(nearDist2[n_accepted-1])/3 (:468 — indexing the SORTED
    distance array, a quirk), euclidean weights, height = projSum /
    (weightSum + 1e-5), in BOTH euclidean and projected-distance modes
    (projected gates ||d|| < r_proj & proj < r, :346,:577).
  * plane_ICP_proj (laser_odometry.cpp:277-413) with its inconsistent
    projected gates ||d|| < r^2 & proj < r_proj (:322).
  * FALS / SRI range-image normals (range_image.cpp:117-261): static M^-1
    window matrices, b = sum(v/r); Prewitt gradients + n = Rhat grad.

The f32 kernel and the f64 oracle can legitimately disagree for points
sitting exactly on a gate boundary (radius, h, angle threshold, top-k tie);
such points are detected by the oracle's margin analysis, must be rare
(asserted), and are excluded from the bitwise mask comparison. Everything
else: identical survivor masks, reason-exclusive counters within the
marginal slack, and heights to <= 1e-4.
"""
import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plo_tpu import config as cfgmod
from plo_tpu.cloud import PointCloud
from plo_tpu.ops import matching

K = 20
H_GATE = 1.0
R = 3.0
R_PROJ = 0.8
ANGLE_THR = 30.0
MARGIN = 1e-3  # relative boundary-margin below which a point is "marginal"

STAGES = ("too_far", "invalid_normal", "normal_constraint", "mls_fail",
          "nan_inf_height")


def _random_world(rng, n_src=300, n_tgt=4000, extent=20.0):
    """Irregular target: clusters + uniform scatter + a plane patch, with
    random unit normals; ~8% of target slots invalid (padding)."""
    centers = rng.uniform(-extent, extent, (12, 3))
    cluster = (centers[rng.integers(0, 12, n_tgt // 2)]
               + rng.normal(0, 0.8, (n_tgt // 2, 3)))
    uniform = rng.uniform(-extent, extent, (n_tgt // 4, 3))
    plane = np.c_[rng.uniform(-extent, extent, (n_tgt // 4, 2)),
                  rng.normal(0, 0.02, n_tgt // 4)]
    tgt = np.concatenate([cluster, uniform, plane]).astype(np.float64)
    rng.shuffle(tgt)
    # Locally smooth normal field + per-point noise: enough coherence that a
    # realistic fraction passes the 30-degree gate, enough spread that the
    # gate, the per-neighbor gates, and the bandwidth quirk all engage.
    base = np.stack([np.sin(tgt[:, 0] / 7.0), np.cos(tgt[:, 1] / 9.0),
                     1.2 + 0.3 * np.sin(tgt[:, 2] / 5.0)], axis=1)
    tn = base + rng.normal(0, 0.35, (n_tgt, 3))
    tn /= np.linalg.norm(tn, axis=1, keepdims=True)
    tvalid = rng.random(n_tgt) > 0.08
    # source points near the target structure (so gates actually engage),
    # normals = the smooth field at the source position + noise.
    src = tgt[rng.integers(0, n_tgt, n_src)] + rng.normal(0, 0.4, (n_src, 3))
    sbase = np.stack([np.sin(src[:, 0] / 7.0), np.cos(src[:, 1] / 9.0),
                      1.2 + 0.3 * np.sin(src[:, 2] / 5.0)], axis=1)
    sn = sbase + rng.normal(0, 0.25, (n_src, 3))
    sn /= np.linalg.norm(sn, axis=1, keepdims=True)
    return src, sn, tgt, tn, tvalid


def _angle64(a, b):
    cos = (a @ b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-300)
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def oracle_imls(src, sn, tgt, tn, tvalid, projected, angle_enabled=True):
    """Float64 re-derivation of ProjSourcePtToSurface (get_normals=true).
    Returns (reason [S] int: -1 survive else STAGES index, height [S],
    anchor_normal [S,3], marginal [S] bool)."""
    n_src = len(src)
    reason = np.full(n_src, -1, np.int64)
    height = np.zeros(n_src)
    anchor_n = np.zeros((n_src, 3))
    marginal = np.zeros(n_src, bool)
    vt = tgt[tvalid]
    vn = tn[tvalid]
    for i in range(n_src):
        x, nx = src[i], sn[i]
        d = vt - x
        dist2 = np.einsum("ij,ij->i", d, d)
        if projected:
            # gates ||d|| < r_proj & proj < r (imls_icp.cpp:346, :577)
            proj = np.linalg.norm(np.cross(d, nx), axis=1)
            gate = (np.sqrt(dist2) < R_PROJ) & (proj < R)
            # A gate-marginal target only matters if it would rank in the
            # top-(K+1) of the (margin-relaxed) candidate set.
            relaxed = np.nonzero((np.sqrt(dist2) < R_PROJ + MARGIN)
                                 & (proj < R + MARGIN))[0]
            top = relaxed[np.argsort(proj[relaxed], kind="stable")][:K + 1]
            marginal[i] |= (np.abs(np.sqrt(dist2[top]) - R_PROJ) < MARGIN).any() \
                or (np.abs(proj[top] - R) < MARGIN).any()
            cand = np.nonzero(gate)[0]
            if len(cand) == 0:
                reason[i] = 0  # too_far
                continue
            order = cand[np.argsort(proj[cand], kind="stable")]
            sel = order[:K]
            near_d2 = proj[sel] ** 2           # squared projected distances
            if len(order) > K:
                marginal[i] |= abs(proj[order[K - 1]] - proj[order[K]]) < MARGIN
            a_idx = sel[0]
            min_dist = proj[a_idx] ** 2
        else:
            order = np.argsort(dist2, kind="stable")
            in_r = order[dist2[order] <= R * R][:K]
            top = order[:K + 1]
            marginal[i] |= (np.abs(np.sqrt(dist2[top]) - R) < MARGIN).any()
            if len(order) > len(in_r) and len(in_r) == K:
                marginal[i] |= abs(np.sqrt(dist2[order[K]]) - np.sqrt(dist2[order[K - 1]])) < MARGIN
            sel = in_r
            if len(sel) == 0:
                reason[i] = 0
                continue
            near_d2 = dist2[sel]
            a_idx = sel[0]
            min_dist = dist2[a_idx]

        marginal[i] |= abs(np.sqrt(max(min_dist, 0.0)) - H_GATE) < MARGIN
        if min_dist > H_GATE * H_GATE:
            reason[i] = 0  # too_far
            continue
        na = vn[a_idx]
        if not np.isfinite(na).all():
            reason[i] = 1
            continue
        if angle_enabled:
            ang = _angle64(nx, na)
            marginal[i] |= abs(ang - ANGLE_THR) < MARGIN * 100
            if ang > ANGLE_THR:
                reason[i] = 2
                continue
        # IMLS neighborhood gates (normal finite + angle vs SOURCE normal)
        acc = []
        for j in sel:
            if not np.isfinite(vn[j]).all():
                continue
            if angle_enabled:
                ang = _angle64(nx, vn[j])
                marginal[i] |= abs(ang - ANGLE_THR) < MARGIN * 100
                if ang > ANGLE_THR:
                    continue
            acc.append(j)
        if len(acc) < 3:
            reason[i] = 3  # mls_fail
            continue
        h_max = np.sqrt(near_d2[len(acc) - 1]) / 3.0  # imls_icp.cpp:468
        w = np.exp(-np.einsum("ij,ij->i", x - vt[acc], x - vt[acc]) / max(h_max * h_max, 1e-300))
        proj_sum = np.sum(w * np.einsum("ij,ij->i", x - vt[acc], vn[acc]))
        hgt = proj_sum / (np.sum(w) + 1e-5)
        if not np.isfinite(hgt):
            reason[i] = 4
            continue
        height[i] = hgt
        anchor_n[i] = na
    return reason, height, anchor_n, marginal


def oracle_plane_icp(src, sn, tgt, tn, tvalid, projected, angle_enabled=True,
                     r=1.5, r_proj=0.8):
    """Float64 plane_ICP_proj (laser_odometry.cpp:277-413)."""
    n_src = len(src)
    reason = np.full(n_src, -1, np.int64)
    y = np.zeros((n_src, 3))
    marginal = np.zeros(n_src, bool)
    vt, vn = tgt[tvalid], tn[tvalid]
    for i in range(n_src):
        x, nx = src[i], sn[i]
        d = vt - x
        dist = np.linalg.norm(d, axis=1)
        if projected:
            # quirk gates: ||d|| < r^2 & proj < r_proj (laser_odometry.cpp:322)
            proj = np.linalg.norm(np.cross(d, nx), axis=1)
            gate = (dist < r * r) & (proj < r_proj)
            relaxed = np.nonzero((dist < r * r + MARGIN)
                                 & (proj < r_proj + MARGIN))[0]
            top = relaxed[np.argsort(proj[relaxed], kind="stable")][:2]
            marginal[i] |= (np.abs(dist[top] - r * r) < MARGIN).any() \
                or (np.abs(proj[top] - r_proj) < MARGIN).any()
            cand = np.nonzero(gate)[0]
            if len(cand) == 0:
                reason[i] = 0
                continue
            a_idx = cand[np.argmin(proj[cand])]
            srt = np.sort(proj[cand])
            if len(srt) > 1:
                marginal[i] |= (srt[1] - srt[0]) < MARGIN
        else:
            a_idx = int(np.argmin(dist))
            top = np.argsort(dist, kind="stable")[:2]
            marginal[i] |= (np.abs(dist[top] - r) < MARGIN).any()
            if dist[a_idx] > r:
                reason[i] = 0
                continue
        na = vn[a_idx]
        if not np.isfinite(na).all():
            reason[i] = 1
            continue
        if angle_enabled:
            ang = _angle64(nx, na)
            marginal[i] |= abs(ang - ANGLE_THR) < MARGIN * 100
            if ang > ANGLE_THR:
                reason[i] = 2
                continue
        y[i] = x - ((x - vt[a_idx]) @ na) * na
    return reason, y, marginal


def _clouds(src, sn, tgt, tn, tvalid):
    s = dc.replace(PointCloud.from_xyz(jnp.asarray(src.astype(np.float32))),
                   normal=jnp.asarray(sn.astype(np.float32)))
    t = dc.replace(PointCloud.from_xyz(jnp.asarray(tgt.astype(np.float32)),
                                       jnp.asarray(tvalid)),
                   normal=jnp.asarray(tn.astype(np.float32)))
    return s, t


@pytest.mark.parametrize("projected", [False, True], ids=["euclidean", "projected"])
def test_imls_cascade_matches_float64_oracle(projected):
    rng = np.random.default_rng(11)
    src, sn, tgt, tn, tvalid = _random_world(rng)
    s, t = _clouds(src, sn, tgt, tn, tvalid)
    cfg = cfgmod.IMLSConfig(
        h=H_GATE, r=R, search_number=K,
        use_projected_distance=cfgmod.ProjectedDistanceConfig(
            enabled=projected, r_proj=R_PROJ),
        normal_angle_constraint=cfgmod.NormalAngleConstraintConfig(
            enabled=True, angle_diff_threshold=ANGLE_THR))
    res = matching.imls_project(s, t, cfg, knn_select="exact")

    reason, height, anchor_n, marginal = oracle_imls(
        src, sn, tgt, tn, tvalid, projected)
    frac_marginal = marginal.mean()
    assert frac_marginal < 0.12, f"degenerate test data: {frac_marginal:.2%} marginal"

    got_valid = np.asarray(res.valid)
    want_valid = reason == -1
    solid = ~marginal
    np.testing.assert_array_equal(got_valid[solid], want_valid[solid])

    # Per-reason exclusive counters within the marginal slack.
    n_marg = int(marginal.sum())
    for si, name in enumerate(STAGES):
        want = int((reason == si).sum())
        got = int(np.asarray(res.counters[name]))
        assert abs(got - want) <= n_marg, (name, got, want, n_marg)

    # Heights on common solid survivors: y = x - h * n_anchor.
    both = got_valid & want_valid & solid
    assert both.sum() > 50
    y_want = src[both] - height[both, None] * anchor_n[both]
    np.testing.assert_allclose(np.asarray(res.y)[both], y_want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.normal)[both],
                               anchor_n[both], atol=1e-5)


@pytest.mark.parametrize("projected", [False, True], ids=["euclidean", "projected"])
def test_plane_icp_cascade_matches_float64_oracle(projected):
    rng = np.random.default_rng(7)
    src, sn, tgt, tn, tvalid = _random_world(rng)
    s, t = _clouds(src, sn, tgt, tn, tvalid)
    cfg = cfgmod.PlaneICPConfig(
        r=1.5,
        use_projected_distance=cfgmod.ProjectedDistanceConfig(
            enabled=projected, r_proj=R_PROJ),
        normal_angle_constraint=cfgmod.NormalAngleConstraintConfig(
            enabled=True, angle_diff_threshold=ANGLE_THR))
    res = matching.plane_icp_project(s, t, cfg)

    reason, y, marginal = oracle_plane_icp(src, sn, tgt, tn, tvalid, projected)
    assert marginal.mean() < 0.12
    got_valid = np.asarray(res.valid)
    want_valid = reason == -1
    solid = ~marginal
    np.testing.assert_array_equal(got_valid[solid], want_valid[solid])
    n_marg = int(marginal.sum())
    for si, name in enumerate(("too_far", "invalid_normal", "normal_constraint")):
        want = int((reason == si).sum())
        got = int(np.asarray(res.counters[name]))
        assert abs(got - want) <= n_marg, (name, got, want)
    both = got_valid & want_valid & solid
    assert both.sum() > 50
    np.testing.assert_allclose(np.asarray(res.y)[both], y[both], atol=1e-4)


def test_imls_freeze_path_matches_full_at_search_pose():
    """At the search pose, the frozen-candidate evaluation must reproduce the
    full euclidean cascade bit-for-bit (same masks, same y)."""
    rng = np.random.default_rng(3)
    src, sn, tgt, tn, tvalid = _random_world(rng)
    s, t = _clouds(src, sn, tgt, tn, tvalid)
    cfg = cfgmod.IMLSConfig(
        h=H_GATE, r=R, search_number=K,
        normal_angle_constraint=cfgmod.NormalAngleConstraintConfig(
            enabled=True, angle_diff_threshold=ANGLE_THR))
    full = matching.imls_project(s, t, cfg, knn_select="exact")
    cache = matching.imls_search(s, t, cfg, knn_select="exact")
    frozen = matching.imls_project_cached(s, t, cfg, cache)
    np.testing.assert_array_equal(np.asarray(full.valid), np.asarray(frozen.valid))
    v = np.asarray(full.valid)
    np.testing.assert_allclose(np.asarray(full.y)[v], np.asarray(frozen.y)[v],
                               atol=1e-5)


# ---------------------------------------------------------------------------
# FALS / SRI oracles (range_image.cpp:117-261)
# ---------------------------------------------------------------------------

def _angles64(h, w, f_up, f_down):
    fu, fd = np.radians(f_up), np.radians(f_down)
    total = fu - fd
    col = np.arange(w)[None, :].repeat(h, 0)
    row = np.arange(h)[:, None].repeat(w, 1)
    az = 2 * np.pi * (1 - col / w) - np.pi
    ve = fd + total * (1 - row / h)
    return az, ve


def _v64(az, ve):
    return np.stack([np.sin(az) * np.cos(ve), np.sin(ve),
                     np.cos(az) * np.cos(ve)], axis=-1)


def test_fals_matches_float64_oracle():
    H, W, ws = 16, 48, 3
    f_up, f_down = 2.0, -24.33
    rng = np.random.default_rng(5)
    img = rng.uniform(4.0, 60.0, (H, W))
    img[rng.random((H, W)) < 0.25] = np.inf

    az, ve = _angles64(H, W, f_up, f_down)
    v = _v64(az, ve)
    # static M^-1 over ALL in-bounds window cells (range_image.cpp:40-83)
    want = np.zeros((H, W, 3))
    ok_want = np.zeros((H, W), bool)
    for r0 in range(H):
        for c0 in range(W):
            if not np.isfinite(img[r0, c0]):
                continue
            M = np.zeros((3, 3))
            b = np.zeros(3)
            for dr in range(-ws, ws + 1):
                for dcd in range(-ws, ws + 1):
                    r1, c1 = r0 + dr, c0 + dcd
                    if not (0 <= r1 < H and 0 <= c1 < W):
                        continue
                    M += np.outer(v[r1, c1], v[r1, c1])
                    if np.isfinite(img[r1, c1]):
                        b += v[r1, c1] / img[r1, c1]
            if np.linalg.det(M) <= 1e-6:
                continue
            n = np.linalg.inv(M) @ b
            n /= np.linalg.norm(n)
            if n[2] < 0:
                n = -n  # the pipeline's +z flip
            want[r0, c0] = n
            ok_want[r0, c0] = True

    from plo_tpu.ops.normals import RangeImageNormals
    eng = RangeImageNormals(H, W, f_up, f_down, ws)
    got, ok = eng.fals(jnp.asarray(img.astype(np.float32)))
    got, ok = np.asarray(got), np.asarray(ok)
    both = ok & ok_want
    assert both.sum() > 100
    np.testing.assert_array_equal(ok, ok_want)
    dots = np.einsum("ij,ij->i", got[both], want[both])
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_sri_matches_float64_oracle():
    H, W, ws = 16, 48, 3
    f_up, f_down = 2.0, -24.33
    rng = np.random.default_rng(9)
    img = rng.uniform(4.0, 60.0, (H, W))
    img[rng.random((H, W)) < 0.25] = np.inf

    az, ve = _angles64(H, W, f_up, f_down)
    want = np.zeros((H, W, 3))
    ok_want = np.zeros((H, W), bool)
    for r0 in range(ws, H - ws):
        for c0 in range(ws, W - ws):
            r = img[r0, c0]
            if not np.isfinite(r):
                continue
            drt = drp = 0.0
            for i in range(-ws, ws + 1):
                for j in range(-ws, ws + 1):
                    nr = img[r0 + i, c0 + j]
                    if not np.isfinite(nr):
                        continue
                    # Mx: +1 for j<0, -1 for j>0; My: +1 for i<0, -1 for i>0
                    drt += nr * (1.0 if j < 0 else (-1.0 if j > 0 else 0.0))
                    drp += nr * (1.0 if i < 0 else (-1.0 if i > 0 else 0.0))
            phi = ve[r0, c0]
            theta = az[r0, c0]
            grad = np.array([1.0, drt / (r * np.cos(phi)), drp / r])
            Rt = np.array([[np.cos(theta), -np.sin(theta), 0],
                           [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
            Rp = np.array([[np.cos(phi), 0, -np.sin(phi)],
                           [0, 1, 0], [np.sin(phi), 0, np.cos(phi)]])
            rhat = np.zeros((3, 3))
            rhat[:, 0] = [0, 0, 1]
            rhat[:, 1] = [1, 0, 0]
            rhat[:, 2] = [0, 1, 0]
            n = (rhat @ (Rt @ Rp)) @ grad
            n /= np.linalg.norm(n)
            if n[2] < 0:
                n = -n
            want[r0, c0] = n
            ok_want[r0, c0] = True

    from plo_tpu.ops.normals import RangeImageNormals
    eng = RangeImageNormals(H, W, f_up, f_down, ws)
    got, ok = eng.sri(jnp.asarray(img.astype(np.float32)))
    got, ok = np.asarray(got), np.asarray(ok)
    np.testing.assert_array_equal(ok, ok_want)
    both = ok & ok_want
    assert both.sum() > 80
    dots = np.einsum("ij,ij->i", got[both], want[both])
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)
