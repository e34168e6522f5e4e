"""Multi-session map merging (pipeline/map_merge.py): two sessions covering
overlapping halves of the same ring, the second expressed in a different
world frame, must align by place recognition + Sim3 and concatenate into
one consistent map."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import (MapConfig, OrbConfig, SENSOR_RGBD,
                                       SlamConfig, VocabConfig)
from orb_slam_2_ros_tpu.geometry import se3, sim3
from orb_slam_2_ros_tpu.pipeline import map_merge
from orb_slam_2_ros_tpu.place import vocabulary

from test_loop_closing import build_looped_map, N_KF, pose_err_deg_m


def merge_cfg():
    return SlamConfig(
        sensor=SENSOR_RGBD,
        orb=OrbConfig(n_features=256, max_kps=256),
        map=MapConfig(max_kfs=48, max_mps=4096, max_kps=256),
        vocab=VocabConfig(k=6, levels=3))


def _crop(m, keep_rows):
    """Keep only the listed keyframe rows valid (observations dropped for
    the rest)."""
    K = m.K
    mask = np.zeros((K,), bool)
    mask[list(keep_rows)] = True
    maskj = jnp.asarray(mask)
    return m._replace(
        kf_valid=m.kf_valid & maskj,
        kf_mp=jnp.where(maskj[:, None], m.kf_mp, -1),
        kf_kp_valid=m.kf_kp_valid & maskj[:, None])


def test_two_sessions_merge_onto_ground_truth():
    cfg = merge_cfg()
    # both sessions see the same physical ring (same seed -> same features
    # and descriptors); session 1 covers keyframes 0..9, session 2 covers
    # 6..15 (overlap 6..9), no drift
    m_full, gt, descs = build_looped_map(cfg, drift_xi=(0, 0, 0, 0, 0, 0))
    m1 = _crop(m_full, range(0, 10))
    m2 = _crop(m_full, range(6, N_KF))

    # session 2 lives in its own world frame: apply a known Sim3
    q_d = se3.quat_exp(jnp.asarray([0.1, -0.3, 0.05]))
    t_d = jnp.asarray([1.5, -0.7, 2.0])
    s_d = jnp.asarray(1.0)
    m2 = map_merge.transform_map(m2, q_d, t_d, s_d)
    # sanity: session-2 poses now far from gt
    errs2 = [pose_err_deg_m(m2.kf_q[i], m2.kf_t[i], *gt[i])[1]
             for i in range(10, N_KF)]
    assert min(errs2) > 0.5

    voc = vocabulary.train_vocabulary(descs, cfg, seed=0)
    merged, info = map_merge.merge_maps(m1, m2, voc, cfg)
    assert info["aligned"], info
    assert info["inliers"] >= map_merge.MIN_MERGE_INLIERS

    # appended session-2 keyframes land back on ground truth
    n1 = int(np.asarray(m1.n_kfs))
    kf_valid = np.asarray(merged.kf_valid)
    n_valid = int(kf_valid.sum())
    assert n_valid == 10 + (N_KF - 6)
    for i in range(6, N_KF):
        row = n1 + i            # session-2 row i appended at offset n1
        if not kf_valid[row]:
            continue
        _, trn = pose_err_deg_m(merged.kf_q[row], merged.kf_t[row], *gt[i])
        assert trn < 0.02, (i, trn)

    # observation ids were offset consistently: every valid observation
    # points at a valid landmark whose position matches the keyframe's view
    kf_mp = np.asarray(merged.kf_mp)
    mp_valid = np.asarray(merged.mp_valid)
    obs = kf_mp[kf_valid]
    obs = obs[obs >= 0]
    assert mp_valid[obs].all()


def test_merge_rejects_unrelated_sessions():
    """Different physical scenes (different seeds) must not align."""
    cfg = merge_cfg()
    m1, _, descs1 = build_looped_map(cfg, drift_xi=(0, 0, 0, 0, 0, 0),
                                     seed=5)
    m2, _, _ = build_looped_map(cfg, drift_xi=(0, 0, 0, 0, 0, 0), seed=11)
    voc = vocabulary.train_vocabulary(descs1, cfg, seed=0)
    merged, info = map_merge.merge_maps(m1, m2, voc, cfg)
    assert merged is None
    assert not info["aligned"]


def test_system_merge_map_roundtrip(tmp_path):
    """System.merge_map: save a session, merge it into another via the
    public facade."""
    cfg = merge_cfg()
    m_full, gt, descs = build_looped_map(cfg, drift_xi=(0, 0, 0, 0, 0, 0))
    m1 = _crop(m_full, range(0, 10))
    m2 = _crop(m_full, range(6, N_KF))
    q_d = se3.quat_exp(jnp.asarray([0.0, 0.2, 0.0]))
    m2 = map_merge.transform_map(m2, q_d, jnp.asarray([0.5, 0, -1.0]),
                                 jnp.asarray(1.0))

    from orb_slam_2_ros_tpu.pipeline.slam import System
    import numpy as _np
    voc = vocabulary.train_vocabulary(descs, cfg, seed=0)
    sys2 = System(cfg, enable_local_ba=False, enable_loop_closing=False,
                   vocab=voc)
    sys2.tracker.attach_map(m2)
    p2 = str(tmp_path / "session2.npz")
    sys2.save_map(p2)

    sys1 = System(cfg, enable_local_ba=False, enable_loop_closing=False,
                   vocab=voc)
    sys1.tracker.attach_map(m1)
    assert sys1.merge_map(p2)
    merged = sys1.tracker.map
    assert int(_np.asarray(merged.kf_valid).sum()) == 10 + (N_KF - 6)
