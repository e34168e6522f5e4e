"""Monocular SLAM end-to-end: two-view bootstrap + scan tracking +
triangulation-based mapping on the synthetic sequence (the reference's mono
node path: MonocularInitialization -> Track -> LocalMapping,
``Tracking.cc:633-816``)."""

import numpy as np

from orb_slam_2_ros_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                       SENSOR_MONOCULAR, SlamConfig,
                                       TrackingConfig)
from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD
from orb_slam_2_ros_tpu.io import trajectory
from orb_slam_2_ros_tpu.pipeline.slam import System
from orb_slam_2_ros_tpu.pipeline.tracking import OK


def mono_cfg():
    cam = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                       cx=159.5, cy=119.5, bf=20.0, th_depth=50.0)
    return SlamConfig(
        sensor=SENSOR_MONOCULAR, camera=cam,
        orb=OrbConfig(n_features=500, n_levels=3, max_kps=640),
        map=MapConfig(max_kfs=16, max_mps=4096, max_kps=640),
        tracking=TrackingConfig(min_init_mono_matches=60))


def test_mono_slam_synthetic():
    cfg = mono_cfg()
    # wider arc -> more parallax for the two-view bootstrap
    ds = SyntheticRGBD(cfg, n_frames=24, seed=0, radius=1.5, angle_range=0.9)
    sys_ = System(cfg, enable_local_ba=True, ba_window=8,
                  enable_loop_closing=False)
    grays = np.stack([ds[i][0] for i in range(len(ds))])
    recs = sys_.track_chunk(grays, None, ds.timestamps)
    states = [r.state for r in recs]
    ok = [r for r in recs if r.state == OK]
    assert len(ok) >= 12, states
    # after init the tracker must not lose the map
    first_ok = states.index(OK)
    assert all(s == OK for s in states[first_ok:]), states

    # monocular scale is free: evaluate ATE after Sim3 alignment
    est = np.stack([r.c_w for r in ok])
    gt = np.stack([ds.gt_pose_wc(r.frame_id)[1] for r in ok])
    ate = trajectory.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.05, f"mono ATE {ate:.4f}"
    assert int(np.asarray(sys_.tracker.map.n_mps)) > 150


def test_mono_system_with_loop_closing_enabled():
    """Loop closing is now ON by default; the monocular pipeline must run
    cleanly with the BoW ingest/detect step active (free-scale Sim3 path
    armed, ``fix_scale=False``) even when no revisit exists — detection
    must stay quiet and tracking unaffected."""
    cfg = mono_cfg()
    ds = SyntheticRGBD(cfg, n_frames=24, seed=0, radius=1.5, angle_range=0.9)
    sys_ = System(cfg, enable_local_ba=True, ba_window=8)   # loops default ON
    grays = np.stack([ds[i][0] for i in range(len(ds))])
    recs = sys_.track_chunk(grays, None, ds.timestamps)
    states = [r.state for r in recs]
    ok = [r for r in recs if r.state == OK]
    assert len(ok) >= 12, states
    first_ok = states.index(OK)
    assert all(s == OK for s in states[first_ok:]), states
    assert sys_.loop_closer.n_loops_closed == 0   # no revisit in the arc
    est = np.stack([r.c_w for r in ok])
    gt = np.stack([ds.gt_pose_wc(r.frame_id)[1] for r in ok])
    ate = trajectory.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.05, f"mono ATE {ate:.4f} with loop closing armed"
