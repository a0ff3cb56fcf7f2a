"""Fault-injection tests (SURVEY.md §5 failure-degradation plan): sensor
frame dropouts and a lost map shard must degrade the trajectory gracefully —
no NaNs, no divergence, recovery after the fault clears."""
import numpy as np
import jax
import jax.numpy as jnp

from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.models import Odometry
from plo_tpu.utils import evaluate

N_SCANS, AZ_STEPS, CAPACITY = 32, 450, 16384


def _cfg(target_mode="window"):
    return cfgmod.Config(
        scan_registration=cfgmod.ScanRegistrationConfig(
            sample_method=cfgmod.SampleConfig(
                method="random", random=cfgmod.RandomSampleConfig(max_points=1200)),
        ),
        laser_odometry=cfgmod.LaserOdometryConfig(
            target_mode=target_mode,
            map=cfgmod.MapConfig(voxel_size=0.3, capacity=32768),
            matching_method=cfgmod.MatchingConfig(method="plane_ICP"),
            solve_method=cfgmod.SolveConfig(method="LS", iterations=20),
        ),
        sensor=cfgmod.SensorConfig(n_scans=N_SCANS, azimuth_resolution=360.0 / AZ_STEPS),
    )


def test_frame_dropout_degrades_gracefully():
    """Dropping 2 consecutive frames mid-sequence (a 3x motion gap): the
    engine must stay finite, re-lock after the gap, and the post-gap relative
    motion must track ground truth again."""
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    scans, gt = synthetic.synthetic_sequence(
        14, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.4, yaw_rate=0.01,
        seed=3, world=world)
    keep = [i for i in range(14) if i not in (6, 7)]  # sensor dropout
    odo = Odometry(_cfg(), capacity=CAPACITY, seed=0)
    for i in keep:
        odo.process_scan(scans[i])
    est = odo.poses()
    assert np.isfinite(est).all()
    # Post-gap per-frame rel poses track GT rels again (re-lock).
    gt_rel = np.linalg.inv(gt[keep[-2]]) @ gt[keep[-1]]
    est_rel = np.linalg.inv(est[-2]) @ est[-1]
    assert np.linalg.norm(est_rel[:3, 3] - gt_rel[:3, 3]) < 0.05


def test_empty_scan_does_not_crash():
    """A totally empty return (sensor blackout frame) yields an identity-ish
    delta and the chain continues (the reference's correspond_number break:
    pose simply isn't updated, laser_odometry.cpp:570-576)."""
    scans, gt = synthetic.synthetic_sequence(
        5, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.4, yaw_rate=0.01, seed=3)
    odo = Odometry(_cfg(), capacity=CAPACITY, seed=0)
    odo.process_scan(scans[0])
    odo.process_scan(scans[1])
    blank = np.zeros((0, 4), np.float32)
    f = odo.process_scan(blank)
    assert np.isfinite(f.pose).all()
    for s in scans[2:]:
        f = odo.process_scan(s)
    assert np.isfinite(f.pose).all()


def test_lost_map_shard_degrades_gracefully():
    """Sharded frame-to-map odometry with one device's map shard wiped mid-run
    (a lost host): tracking continues on the surviving 7/8 of the map, stays
    finite, and the shard re-fills from subsequent insertions."""
    from plo_tpu.parallel import get_mesh, ShardedMapOdometry
    import dataclasses as dc

    cfg = dc.replace(
        _cfg("map"),
        laser_odometry=dc.replace(
            _cfg("map").laser_odometry,
            refresh_correspondences=False,
            matching_method=cfgmod.MatchingConfig(method="IMLS")))
    world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=60.0)
    scans, gt = synthetic.synthetic_sequence(
        10, n_scans=N_SCANS, azimuth_steps=AZ_STEPS, speed=0.4, yaw_rate=0.01,
        seed=3, world=world)
    gtr = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)

    mesh = get_mesh(8)
    sodo = ShardedMapOdometry(cfg, mesh, capacity=CAPACITY, seed=0)
    for s in scans[:6]:
        sodo.process_scan(s)
    # Fault: wipe shard 3's map points (simulated host loss + blank rejoin).
    m = sodo.store.per_shard
    valid = np.array(sodo.store.cloud.valid)  # writable copy
    before = int(valid[3 * m:4 * m].sum())
    assert before > 0
    valid[3 * m:4 * m] = False
    import dataclasses as dc2
    sodo.store.cloud = jax.device_put(
        dc2.replace(sodo.store.cloud, valid=jnp.asarray(valid)),
        sodo._shard_spec)
    for s in scans[6:]:
        sodo.process_scan(s)
    est = sodo.poses()
    assert np.isfinite(est).all()
    ate = evaluate.ate_rmse(est, gtr, align=False)
    assert ate < 0.1, ate
    # The wiped shard re-fills from post-fault insertions.
    valid_after = np.asarray(sodo.store.cloud.valid)
    assert int(valid_after[3 * m:4 * m].sum()) > 0
