"""Config-system parity tests (C1/C31): the reference's config.json and every
shipped preset must load 1:1 into the typed tree, dispatch the right stages,
and drive a smoke frame; reference-format loads default to reference
semantics (no motion prior / no undistortion)."""
import dataclasses
import glob
import json
import os

import numpy as np
import pytest

from plo_tpu import config as cfgmod

REFERENCE_CONFIG = "/root/reference/config.json"
PRESETS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "*.json")))


def test_reference_config_loads_with_key_parity():
    """Every method name and the numeric params the back-end reads per frame
    (laser_odometry.cpp:183-275, 487-506) must survive the round trip."""
    with open(REFERENCE_CONFIG) as f:
        tree = json.load(f)
    cfg = cfgmod.from_dict(tree)

    sr, lo = tree["scan_registration"], tree["laser_odometry"]
    assert cfg.scan_registration.compute_normal_method.format == sr["compute_normal_method"]["format"]
    assert cfg.scan_registration.compute_normal_method.method == sr["compute_normal_method"]["method"]
    assert cfg.scan_registration.presample_method.method == sr["presample_method"]["method"]
    assert cfg.scan_registration.sample_method.method == sr["sample_method"]["method"]
    assert cfg.laser_odometry.matching_method.method == lo["matching_method"]["method"]
    assert cfg.laser_odometry.solve_method.method == lo["solve_method"]["method"]
    assert cfg.laser_odometry.max_queue_size == lo["max_queue_size"]
    assert cfg.laser_odometry.solve_method.iterations == lo["solve_method"]["iterations"]

    imls = lo["matching_method"]["IMLS"]
    assert cfg.laser_odometry.matching_method.imls.h == imls["h"]
    assert cfg.laser_odometry.matching_method.imls.r == imls["r"]
    assert cfg.laser_odometry.matching_method.imls.search_number == imls["IMLS function"]["search_number"]
    assert cfg.laser_odometry.matching_method.imls.get_normals.enabled == imls["get_normals"]["enabled"]

    ransac = lo["solve_method"]["RANSAC"]
    assert cfg.laser_odometry.solve_method.ransac.max_iterations == ransac["max_iterations"]
    assert cfg.laser_odometry.solve_method.ransac.distance_threshold == ransac["distance_threshold"]
    assert cfg.laser_odometry.solve_method.ransac.final_solve_method == ransac["final_solve_method"]

    pca = sr["compute_normal_method"]["pca"]
    assert cfg.scan_registration.compute_normal_method.pca.window_size == pca["window_size"]
    assert (cfg.scan_registration.compute_normal_method.pca.plane_constraint.distance_threshold
            == pca["plane_constraint"]["distance_threshold"])


def test_reference_load_defaults_to_reference_semantics():
    """A reference-format load must behave like the shipped node: identity ICP
    init (laser_odometry.cpp:484-485), no undistortion (DISTORTION 0, :29);
    the extensions are explicit opt-ins."""
    cfg = cfgmod.load(REFERENCE_CONFIG)
    assert cfg.laser_odometry.motion_prior is False
    assert cfg.laser_odometry.undistort is False
    assert cfg.laser_odometry.refresh_correspondences is True
    # Explicit opt-in via the (non-reference) keys.
    with open(REFERENCE_CONFIG) as f:
        tree = json.load(f)
    tree["laser_odometry"]["motion_prior"] = True
    assert cfgmod.from_dict(tree).laser_odometry.motion_prior is True
    # The framework's own Python-constructed default keeps the prior on.
    assert cfgmod.Config().laser_odometry.motion_prior is True


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_loads_and_smokes_one_frame(path):
    """Every shipped preset loads, builds its pipeline, and featurizes one
    small synthetic frame (stage dispatch + finite outputs)."""
    import jax
    from plo_tpu.io import synthetic
    from plo_tpu.models.pipeline import FrontEnd

    sensor = cfgmod.SensorConfig(n_scans=32, azimuth_resolution=1.0)
    cfg = cfgmod.load(path, sensor=sensor)
    fe = FrontEnd(cfg, capacity=12288)
    scans, _ = synthetic.synthetic_sequence(1, n_scans=32, azimuth_steps=360, seed=1)
    out = fe.process(scans[0], jax.random.PRNGKey(0), None, first_frame=True)
    n_sampled = int(out.flat.valid.sum())
    n_filtered = int(out.filtered.valid.sum())
    assert n_filtered > 500, f"{path}: filtered cloud empty"
    assert n_sampled > 50, f"{path}: sampled cloud empty"
    assert np.isfinite(np.asarray(out.flat.xyz)[np.asarray(out.flat.valid)]).all()


def test_reference_config_smokes_one_frame():
    import jax
    from plo_tpu.io import synthetic
    from plo_tpu.models.pipeline import FrontEnd

    cfg = cfgmod.load(REFERENCE_CONFIG,
                      sensor=cfgmod.SensorConfig(n_scans=32, azimuth_resolution=1.0))
    fe = FrontEnd(cfg, capacity=12288)
    scans, _ = synthetic.synthetic_sequence(1, n_scans=32, azimuth_steps=360, seed=1)
    out = fe.process(scans[0], jax.random.PRNGKey(0), None, first_frame=True)
    assert int(out.flat.valid.sum()) > 50


def test_invalid_combo_rejected_at_build():
    """tensor_voting presample without a PCA normal stage crashed at trace
    time (FALS/SRI) or silently fed zero tensors (cross_product) — now a
    clear build-time error."""
    from plo_tpu.models.pipeline import FrontEnd

    for fmt, method in (("range_image", "FALS"), ("range_image", "SRI"),
                        ("pointcloud", "cross_product")):
        cfg = cfgmod.Config(
            scan_registration=cfgmod.ScanRegistrationConfig(
                compute_normal_method=cfgmod.ComputeNormalConfig(format=fmt, method=method),
                presample_method=cfgmod.PresampleConfig(method="tensor_voting"),
            ))
        with pytest.raises(ValueError, match="tensor_voting"):
            FrontEnd(cfg, capacity=4096)
    # pca modes (both layouts) stay allowed.
    for fmt in ("pointcloud", "range_image"):
        cfg = cfgmod.Config(
            scan_registration=cfgmod.ScanRegistrationConfig(
                compute_normal_method=cfgmod.ComputeNormalConfig(format=fmt, method="pca"),
                presample_method=cfgmod.PresampleConfig(method="tensor_voting"),
            ),
            sensor=cfgmod.SensorConfig(n_scans=32, azimuth_resolution=1.0))
        FrontEnd(cfg, capacity=4096)


def test_unknown_method_names_rejected():
    from plo_tpu.models.pipeline import FrontEnd
    cfg = cfgmod.Config(scan_registration=cfgmod.ScanRegistrationConfig(
        sample_method=cfgmod.SampleConfig(method="bogus")))
    with pytest.raises(ValueError, match="bogus"):
        FrontEnd(cfg, capacity=4096)
