"""CreateNewMapPoints unit test: two keyframes with shared tracked points
(covisibility) plus unmatched corresponding keypoints that must get
triangulated into new landmarks (``LocalMapping.cc:239-500``)."""

import numpy as np
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import (MapConfig, OrbConfig, SENSOR_MONOCULAR,
                                       SlamConfig)
from orb_slam_2_ros_tpu.geometry import camera, se3
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.pipeline.local_mapping import create_new_map_points


def small_cfg():
    return SlamConfig(
        sensor=SENSOR_MONOCULAR,
        orb=OrbConfig(n_features=256, max_kps=256),
        map=MapConfig(max_kfs=8, max_mps=1024, max_kps=256))


def build_two_kf_map(cfg, n_shared=25, n_new=100, noise=0.2, seed=3):
    rng = np.random.default_rng(seed)
    K, P, M = cfg.map.max_kfs, cfg.map.max_kps, cfg.map.max_mps
    m = map_state.empty(cfg)

    q0, t0 = se3.identity()
    q1, t1 = se3.exp(jnp.asarray([0.3, 0.02, 0.01, 0.01, -0.04, 0.02]))
    pts_shared = np.stack([rng.uniform(-2, 2, n_shared),
                           rng.uniform(-1.5, 1.5, n_shared),
                           rng.uniform(4, 8, n_shared)], -1).astype(np.float32)
    pts_new = np.stack([rng.uniform(-2, 2, n_new),
                        rng.uniform(-1.5, 1.5, n_new),
                        rng.uniform(4, 8, n_new)], -1).astype(np.float32)

    kf_q = np.stack([np.asarray(q0), np.asarray(q1)])
    kf_t = np.stack([np.asarray(t0), np.asarray(t1)])

    def fill_kf(i, q, t):
        uv_s = np.array(camera.project(cfg.camera,
                                       se3.apply(q, t, jnp.asarray(pts_shared))))
        uv_n = np.array(camera.project(cfg.camera,
                                       se3.apply(q, t, jnp.asarray(pts_new))))
        uv = np.concatenate([uv_s, uv_n]) + rng.normal(0, noise,
                                                       (n_shared + n_new, 2))
        return uv

    uv0 = fill_kf(0, q0, t0)
    uv1 = fill_kf(1, q1, t1)
    descs = rng.integers(0, 2 ** 32, (n_shared + n_new, 8), dtype=np.uint32)

    kf_uv = np.zeros((K, P, 2), np.float32)
    kf_desc = np.zeros((K, P, 8), np.uint32)
    kf_kp_valid = np.zeros((K, P), bool)
    kf_mp = np.full((K, P), -1, np.int32)
    kf_angle = np.zeros((K, P), np.float32)
    n_tot = n_shared + n_new
    for i, uv in enumerate([uv0, uv1]):
        kf_uv[i, :n_tot] = uv
        kf_desc[i, :n_tot] = descs
        kf_kp_valid[i, :n_tot] = True
        kf_mp[i, :n_shared] = np.arange(n_shared)

    mp_pos = np.zeros((M, 3), np.float32)
    mp_pos[:n_shared] = pts_shared
    mp_valid = np.zeros((M,), bool)
    mp_valid[:n_shared] = True

    kf_q_full = np.tile(np.array([1.0, 0, 0, 0], np.float32), (K, 1))
    kf_q_full[:2] = kf_q
    kf_t_full = np.zeros((K, 3), np.float32)
    kf_t_full[:2] = kf_t
    m = m._replace(
        kf_q=jnp.asarray(kf_q_full),
        kf_t=jnp.asarray(kf_t_full),
        kf_valid=jnp.zeros((K,), bool).at[:2].set(True),
        kf_uv=jnp.asarray(kf_uv), kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.asarray(kf_kp_valid), kf_mp=jnp.asarray(kf_mp),
        kf_angle=jnp.asarray(kf_angle),
        mp_pos=jnp.asarray(mp_pos), mp_valid=jnp.asarray(mp_valid),
        mp_first_kf=jnp.full((M,), -1, jnp.int32).at[:n_shared].set(0),
        n_kfs=jnp.int32(2), n_mps=jnp.int32(n_shared))
    return m, pts_new, n_shared, n_new


def test_triangulates_unmatched_correspondences():
    cfg = small_cfg()
    m, pts_new, n_shared, n_new = build_two_kf_map(cfg)
    m2, n_spawned = create_new_map_points(m, cfg)
    n_spawned = int(n_spawned)
    assert n_spawned > 0.7 * n_new, n_spawned

    new_pos = np.asarray(m2.mp_pos[n_shared:n_shared + n_spawned])
    # each spawned point must be near one of the ground-truth new points
    d = np.linalg.norm(new_pos[:, None, :] - pts_new[None], axis=-1)
    assert np.median(d.min(1)) < 0.05
    # observations registered in both keyframes
    kf_mp = np.asarray(m2.kf_mp)
    assert (kf_mp[0] >= n_shared).sum() == n_spawned
    assert (kf_mp[1] >= n_shared).sum() == n_spawned
    assert int(m2.n_mps) == n_shared + n_spawned


def test_no_spawn_without_covisibility():
    cfg = small_cfg()
    m, pts_new, n_shared, n_new = build_two_kf_map(cfg)
    # remove the shared associations -> covisibility 0 -> neighbor gate off
    kf_mp = np.asarray(m.kf_mp).copy()
    kf_mp[:, :n_shared] = -1
    m = m._replace(kf_mp=jnp.asarray(kf_mp))
    m2, n_spawned = create_new_map_points(m, cfg)
    assert int(n_spawned) == 0
