"""Localization-only visual-odometry mode: tracking must survive on
temporal depth-spawned points when the camera leaves the mapped region
(``Tracking.cc:349-418`` + UpdateLastFrame's VO points ``:893-968``)."""

import numpy as np

from orb_slam_2_ros_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                       SENSOR_RGBD, SlamConfig,
                                       TrackingConfig)
from orb_slam_2_ros_tpu.io.synthetic import make_room, render
from orb_slam_2_ros_tpu.pipeline.slam import System
from orb_slam_2_ros_tpu.pipeline.tracking import OK


def _cfg(localization_only=False):
    cam = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                       cx=159.5, cy=119.5, bf=20.0, th_depth=50.0)
    return SlamConfig(
        sensor=SENSOR_RGBD, camera=cam, localization_only=localization_only,
        orb=OrbConfig(n_features=500, n_levels=3, max_kps=640),
        map=MapConfig(max_kfs=16, max_mps=4096, max_kps=640),
        tracking=TrackingConfig(min_init_stereo_kps=200))


def _yaw_pose(yaw, c):
    cy, sy = np.cos(yaw), np.sin(yaw)
    R = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    return R, np.asarray(c, np.float32)


def test_vo_mode_survives_leaving_the_map(tmp_path):
    cfg = _cfg()
    planes = make_room(0)
    c0 = np.array([0.0, 0.0, 0.0], np.float32)

    # phase 1: map the view straight ahead (yaw 0) with a normal session
    sys_map = System(cfg, enable_local_ba=False, enable_loop_closing=False)
    frames = [render(planes, *_yaw_pose(0.0, c0), cfg.camera)
              for _ in range(2)]
    grays = np.stack([f[0] for f in frames])
    depths = np.stack([f[1] for f in frames])
    recs = sys_map.track_chunk(grays, depths)
    assert recs[-1].state == OK
    map_path = str(tmp_path / "m.npz")
    sys_map.save_map(map_path)

    # phase 2: localization-only against the saved map while the camera
    # yaws ~80 deg — the mapped wall leaves the frustum entirely
    sys_loc = System(_cfg(localization_only=True), enable_local_ba=False,
                     load_map=map_path)
    # ~2.8 deg/frame: inside the projection-search window like a real
    # 30 Hz sequence (5+ deg/frame defeats the matcher by design —
    # th=15 px windows, ORBmatcher.cc:45-129)
    yaws = np.concatenate([np.zeros(3), np.linspace(0.0, 1.4, 29)])
    n = len(yaws)
    frames = [render(planes, *_yaw_pose(y, c0), cfg.camera) for y in yaws]
    grays = np.stack([f[0] for f in frames])
    depths = np.stack([f[1] for f in frames])
    recs = sys_loc.track_chunk(grays, depths)

    states = [r.state for r in recs]
    assert all(s == OK for s in states), states
    # early frames anchor on the map...
    assert recs[1].n_map_inliers > 30
    # ...late frames have left it and ride the temporal VO points
    assert recs[-1].n_map_inliers < 10, recs[-1].n_map_inliers
    assert recs[-1].n_inliers >= 30
    # the map stayed frozen (localization mode never inserts keyframes)
    assert not any(r.is_keyframe for r in recs)
    # pose kept moving with the yaw (not stuck at the last mapped pose)
    R_last = recs[-1].R_wc
    R_gt, _ = _yaw_pose(yaws[-1], c0)
    ang = np.degrees(np.arccos(
        np.clip((np.trace(R_gt.T @ R_last) - 1) / 2, -1, 1)))
    assert ang < 5.0, f"final orientation off by {ang:.1f} deg"
