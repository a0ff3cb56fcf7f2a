import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.cloud import PointCloud
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.ops import normals as normals_ops, preprocess, tensor_voting as tv
from plo_tpu.utils import evaluate


def plane_cloud(rng, n=1000, extent=10.0):
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, :2] = (rng.random((n, 2)) - 0.5) * extent
    cloud = PointCloud.from_xyz(jnp.asarray(xyz))
    nrm = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
    return dataclasses.replace(cloud, normal=jnp.asarray(nrm))


def test_vote_kernel_preserves_stick_orientation(rng):
    """A stick tensor voted between two coplanar points keeps its normal
    direction (the CFTV plane-propagation property for in-plane offsets)."""
    n = np.array([0, 0, 1.0])
    T = np.outer(n, n)
    r = np.array([[0.5, 0.0, 0.0]])  # in-plane offset
    vote = np.asarray(tv._vote_kernel(jnp.asarray(r), jnp.asarray(T[None]), sigma=0.2))[0]
    w, v = np.linalg.eigh(vote)
    stick = v[:, np.argmax(w)]
    assert abs(stick[2]) > 0.99


def test_vote_for_any_plane_normals(rng):
    tgt = plane_cloud(rng, n=2000)
    q = np.zeros((50, 3), np.float32)
    q[:, :2] = (rng.random((50, 2)) - 0.5) * 5
    q[:, 2] = 0.1
    cfg = cfgmod.IMLSTensorVotingConfig(enabled=True, k=50, sigma=0.2, distance_threshold=10.0)
    nrm, ok = tv.vote_for_any(tgt.xyz, tgt.valid, tgt.normal,
                              jnp.asarray(q), jnp.ones(50, bool), cfg)
    okn = np.asarray(ok)
    assert okn.sum() > 40
    nn = np.asarray(nrm)[okn]
    # Off-plane queries get slightly tilted votes (the reflection term of the
    # CFTV kernel sees the 0.1 z-offset) — require dominant +z.
    assert (nn[:, 2] > 0.8).all()
    assert nn[:, 2].mean() > 0.95


def test_saliency_presample_on_scan():
    scans, _ = synthetic.synthetic_sequence(1, n_scans=64, azimuth_steps=360, seed=2)
    raw = scans[0]
    P = 24576
    pts = np.zeros((P, 4), np.float32)
    n = min(len(raw), P)
    pts[:n] = raw[:n]
    rc = preprocess.preprocess(jnp.asarray(pts), n, cfgmod.SensorConfig(n_scans=64))
    nres = normals_ops.compute_normals_pca(rc, cfgmod.PCAConfig(), use_all_points=True)
    res = tv.saliency_presample(nres.cloud, nres.eigvecs,
                                cfgmod.TensorVotingConfig(k=20, sigma=0.2))
    valid = np.asarray(res.cloud.valid)
    assert valid.sum() > 1000
    labels = np.asarray(res.labels)[valid]
    assert set(np.unique(labels)).issubset({1, 2, 3})
    # Planar scene: most points are non-ball, with a large surface fraction
    # (ring spacing >> in-ring spacing makes some plane points vote "curve").
    assert (labels != 1).mean() > 0.5
    assert (labels == 3).mean() > 0.25
    cand = np.asarray(res.candidates)
    assert cand.sum() > 0
    assert (np.asarray(res.labels)[cand] != 1).all()  # candidates are non-ball
    # Voted normals are unit, +z hemisphere.
    nn = np.asarray(res.cloud.normal)[valid]
    np.testing.assert_allclose(np.linalg.norm(nn, axis=1), 1.0, atol=1e-4)
    assert (nn[:, 2] >= -1e-6).all()


def test_tensor_voting_pipeline_e2e():
    """Full pipeline with tensor-voting presample + IMLS w/ VoteForAny anchor
    normals runs end to end.

    Capability-level assertions only: this method combination is marked
    broken/unverified in the reference's own results matrix (results.png —
    gray), and its quirks are reproduced here (voted per-SOURCE anchor
    normals substituting target normals, unflipped PCA neighbor normals vs the
    30-degree gate), so trajectory accuracy is not a parity requirement."""
    cfg = cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            presample_method=cfgmod.PresampleConfig(
                method="tensor_voting",
                tensor_voting=cfgmod.TensorVotingConfig(k=20, sigma=0.2)),
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1500)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            matching_method=cfgmod.MatchingConfig(
                method="IMLS",
                imls=cfgmod.IMLSConfig(
                    get_normals=cfgmod.GetNormalsConfig(enabled=False),
                    use_tensor_voting=cfgmod.IMLSTensorVotingConfig(
                        enabled=True, k=20, sigma=0.2, distance_threshold=10.0))),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
        ),
        sensor=cfgmod.SensorConfig(n_scans=32, azimuth_resolution=1.0),
    )
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    scans, gt = synthetic.synthetic_sequence(2, n_scans=32, azimuth_steps=360,
                                             speed=0.4, seed=5, world=world)
    odo = Odometry(cfg, capacity=12288, seed=0)
    frames = [odo.process_scan(s) for s in scans]
    assert all(np.isfinite(f.pose).all() for f in frames)
    assert frames[-1].n_correspondences > 0  # the voted-normal path matched


def test_descriptor_layout(tmp_path):
    import dataclasses as dc
    rng = np.random.default_rng(0)
    cloud = plane_cloud(rng, n=200)
    from plo_tpu.ops import normals as _  # noqa
    eigvecs = np.tile(np.eye(3, dtype=np.float32), (200, 1, 1))
    ev = np.tile(np.array([1.0, 0.5, 0.01], np.float32), (200, 1))
    cloud = dc.replace(cloud, eigvals=jnp.asarray(ev))
    res = tv.saliency_presample(cloud, jnp.asarray(eigvecs),
                                cfgmod.TensorVotingConfig(k=10, sigma=0.2))
    desc = np.asarray(res.descriptors())
    assert desc.shape == (22, 200)
    v = np.asarray(res.cloud.valid)
    # rows 0-2 are the saliencies; labels row 9 matches res.labels
    np.testing.assert_allclose(desc[0, v], np.asarray(res.surfaceness)[v], rtol=1e-5)
    np.testing.assert_array_equal(desc[9, v].astype(int), np.asarray(res.labels)[v])

    from plo_tpu.utils import saver
    p = tmp_path / "desc.txt"
    saver.save_descriptors_txt(res, str(p))
    line = p.read_text().strip().split("\n")[0].split()
    assert len(line) == 25  # xyz + 22 descriptor rows
