"""Full-system loop closure: the shipped pipeline (tracking + local mapping
+ loop closing + background GBA) on a rendered 360-degree revisit sequence.

This is the System-level equivalent of the MapState-level ring tests in
test_loop_closing.py: frames come in as images, keyframes/landmarks are
built by the tracker and mapper, the revisit is detected by BoW on real
(rendered) descriptors, and the GBA runs CHUNKED in the background while
tracking continues (LoopClosing.cc:689's detached thread)."""

import numpy as np
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import (MapConfig, OrbConfig, SENSOR_RGBD,
                                       SlamConfig, TrackingConfig,
                                       VocabConfig)
from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD
from orb_slam_2_ros_tpu.io.trajectory import ate_rmse
from orb_slam_2_ros_tpu.pipeline.slam import System
from orb_slam_2_ros_tpu.pipeline.tracking import OK


def test_system_closes_loop_on_revisit_sequence():
    cfg = SlamConfig(
        sensor=SENSOR_RGBD,
        orb=OrbConfig(n_features=256, max_kps=256),
        map=MapConfig(max_kfs=48, max_mps=4096, max_kps=256),
        vocab=VocabConfig(k=6, levels=3),
        # scale the reference's 500-kp init gate (Tracking.cc:548) to this
        # test's 256-feature budget
        tracking=TrackingConfig(min_init_stereo_kps=120))
    n = 96
    ds = SyntheticRGBD(cfg, n_frames=n, seed=0, trajectory="loop")
    grays = np.stack([ds[i][0] for i in range(n)])
    depths = np.stack([ds[i][1] for i in range(n)])

    # in-domain vocabulary: train on descriptors extracted from a few
    # frames of the scene (production mode; default_vocabulary's random
    # codes are the zero-egress fallback)
    from orb_slam_2_ros_tpu.frontend import frame as frame_mod
    from orb_slam_2_ros_tpu.place import vocabulary
    descs = []
    for i in range(0, n, 16):
        f = frame_mod.build_rgbd(jnp.asarray(grays[i], jnp.float32),
                                 jnp.asarray(depths[i], jnp.float32), cfg)
        d = np.asarray(f.kps.desc)[np.asarray(f.valid)]
        descs.append(d)
    voc = vocabulary.train_vocabulary(np.concatenate(descs), cfg, seed=0)

    sys_ = System(cfg, enable_local_ba=True, ba_window=8, vocab=voc)
    recs = sys_.track_chunk(grays, depths, ds.timestamps)
    # end-of-sequence drain: detection verdicts are consumed asynchronously
    # (LoopCloser.process defer=True); flush() checks any still queued
    sys_.flush()

    ok = [r for r in recs if r.state == OK]
    assert len(ok) >= n - 4, [r.state for r in recs]
    # the revisit must have closed at least one loop through the full stack
    assert sys_.loop_closer.n_loops_closed >= 1, sys_.metrics()
    # tracking kept flowing while the background GBA ran: records exist for
    # every frame and the GBA either finished or is still pending cleanly
    assert len(recs) == n
    assert sys_.loop_closer.n_gba_finished + int(
        sys_.loop_closer.gba_running) >= 1
    m = sys_.tracker.carry.m
    assert bool(jnp.isfinite(m.kf_q).all() & jnp.isfinite(m.mp_pos).all())

    # trajectory accuracy after the loop: composed trajectory vs gt
    est = np.stack([r.c_w for r in ok])
    gt = np.stack([ds.gt_pose_wc(r.frame_id)[1] for r in ok])
    # gt is expressed in the world frame anchored at gt frame 0; the map
    # frame is anchored at the first camera — re-express
    R0, c0 = ds.gt_pose_wc(0)
    gt = (gt - c0) @ R0
    ate = ate_rmse(est, gt)
    assert ate < 0.25, ate
