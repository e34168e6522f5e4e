"""Hard synthetic sequences (BASELINE.md proxy suite): exposure drift,
fast rotation, and a double revisit — the failure modes real datasets add
on top of the clean orbit/loop renders. Gives "matching reference ATE"
teeth without network egress (round-3 VERDICT item 7)."""

import numpy as np

from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_RGBD
from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD
from orb_slam_2_ros_tpu.io.trajectory import ate_rmse
from orb_slam_2_ros_tpu.pipeline.slam import System
from orb_slam_2_ros_tpu.pipeline.tracking import OK, Tracker


def _run_system(sys_, ds, n):
    grays = np.stack([ds[i][0] for i in range(n)])
    depths = np.stack([ds[i][1] for i in range(n)])
    sys_.track_chunk(grays, depths, ds.timestamps[:n])
    sys_.flush()
    return sys_.records


def _ate(sys_, ds):
    poses, ts = sys_.tracker.composed_trajectory()
    est = np.stack([c for _, c in poses])
    R0, c0 = ds.gt_pose_wc(0)
    idx = {t: i for i, t in enumerate(ds.timestamps)}
    gt = np.stack([R0.T @ (ds.gt_pose_wc(idx[t])[1] - c0) for t in ts])
    return ate_rmse(est, gt)


def test_exposure_drift_tracking():
    """±30% gain sweep + bias ramp: BRIEF's intensity comparisons and the
    FAST 20->7 fallback must hold matching together through the sweep."""
    cfg = SlamConfig(sensor=SENSOR_RGBD)
    n = 48
    ds = SyntheticRGBD(cfg, n_frames=n, seed=0, exposure_drift=0.3)
    sys_ = System(cfg, enable_loop_closing=False)
    recs = _run_system(sys_, ds, n)
    n_ok = sum(r.state == OK for r in recs)
    assert n_ok >= n - 2, n_ok
    ate = _ate(sys_, ds)
    assert ate < 0.02, ate


def test_fast_rotation_tracking():
    """Aggressive yaw sweep (~77 deg/s peak) with near-zero parallax: the
    widened-window fallback and reference-KF re-association must keep the
    pose estimable (Tracking.cc:1002-1016, :328-339)."""
    cfg = SlamConfig(sensor=SENSOR_RGBD)
    n = 48
    ds = SyntheticRGBD(cfg, n_frames=n, seed=0, trajectory="fastrot")
    sys_ = System(cfg, enable_loop_closing=False)
    recs = _run_system(sys_, ds, n)
    n_ok = sum(r.state == OK for r in recs)
    # brief losses during the peak-rate frames are acceptable; the run must
    # not end lost and most frames track
    assert n_ok >= 0.85 * n, n_ok
    assert recs[-1].state == OK
    ate = _ate(sys_, ds)
    assert ate < 0.05, ate
