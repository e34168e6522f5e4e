"""Stereo tracking end-to-end: rectified L/R pairs through the full pipeline
(the reference's stereo node path, ``StereoNode.cc`` + ``Frame.cc:62-118``)."""

import numpy as np

from orb_slam_2_ros_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                       SENSOR_STEREO, SlamConfig,
                                       TrackingConfig)
from orb_slam_2_ros_tpu.io.synthetic import SyntheticStereo
from orb_slam_2_ros_tpu.io import trajectory
from orb_slam_2_ros_tpu.pipeline.tracking import OK, Tracker


def stereo_cfg():
    cam = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                       cx=159.5, cy=119.5, bf=26.0, th_depth=50.0)
    return SlamConfig(
        sensor=SENSOR_STEREO, camera=cam,
        orb=OrbConfig(n_features=500, n_levels=3, max_kps=640),
        map=MapConfig(max_kfs=16, max_mps=4096, max_kps=640),
        tracking=TrackingConfig(min_init_stereo_kps=150))


def test_stereo_depth_accuracy():
    """Stereo-matched depths must agree with the renderer's ground truth."""
    import jax.numpy as jnp
    from orb_slam_2_ros_tpu.frontend import frame as frame_mod
    from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD

    cfg = stereo_cfg()
    ds_s = SyntheticStereo(cfg, n_frames=1, seed=0)
    ds_d = SyntheticRGBD(cfg, n_frames=1, seed=0)
    gl, gr = ds_s[0]
    _, depth_gt = ds_d[0]
    f = frame_mod.build_stereo(jnp.asarray(gl), jnp.asarray(gr), cfg)
    uv = np.asarray(f.kps.xy)
    d = np.asarray(f.depth)
    ok = np.asarray(f.valid) & (d > 0)
    assert ok.sum() > 150, int(ok.sum())
    xi = np.clip(np.round(uv[ok, 0]).astype(int), 0, cfg.camera.width - 1)
    yi = np.clip(np.round(uv[ok, 1]).astype(int), 0, cfg.camera.height - 1)
    gt = depth_gt[yi, xi]
    rel = np.abs(d[ok] - gt) / gt
    assert np.median(rel) < 0.02, float(np.median(rel))


def test_stereo_tracking_synthetic():
    cfg = stereo_cfg()
    ds = SyntheticStereo(cfg, n_frames=16, seed=0)
    tr = Tracker(cfg)
    lefts = np.stack([ds[i][0] for i in range(len(ds))])
    rights = np.stack([ds[i][1] for i in range(len(ds))])
    recs = tr.process_chunk(lefts, rights, ds.timestamps)
    assert all(r.state == OK for r in recs), [r.state for r in recs]
    est = np.stack([r.c_w for r in recs])
    gt = np.stack([ds.gt_pose_wc(i)[1] for i in range(len(ds))])
    ate = trajectory.ate_rmse(est, gt)
    assert ate < 0.05, f"ATE {ate:.4f} m"
    assert int(tr.map.n_mps) > 200
