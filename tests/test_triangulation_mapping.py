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


def test_reference_breadth_ten_neighbors_single_pass():
    """Triangulation breadth (``LocalMapping.cc:247``: nn=10 stereo/RGB-D):
    the newest keyframe's unmatched keypoints are distributed across TEN
    disjoint covisible neighbors — a narrower sweep could only ever spawn
    the subsets owned by the neighbors it visits, and with the keyframe
    stream ENDED there is no later step to revisit the rest. The batched
    pass must reach reference breadth (>= 90% of all pairable points) in
    ONE step."""
    from orb_slam_2_ros_tpu.config import SENSOR_RGBD
    rng = np.random.default_rng(7)
    cfg = SlamConfig(
        sensor=SENSOR_RGBD,
        orb=OrbConfig(n_features=256, max_kps=256),
        map=MapConfig(max_kfs=16, max_mps=2048, max_kps=256))
    K, P, M = cfg.map.max_kfs, cfg.map.max_kps, cfg.map.max_mps
    m = map_state.empty(cfg)
    NR, N_SHARED, N_FREE = 10, 15, 10

    kf_q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (K, 1))
    kf_t = np.zeros((K, 3), np.float32)
    kf_uv = np.zeros((K, P, 2), np.float32)
    kf_desc = np.zeros((K, P, 8), np.uint32)
    kf_kp_valid = np.zeros((K, P), bool)
    kf_mp = np.full((K, P), -1, np.int32)
    mp_pos = np.zeros((M, 3), np.float32)
    mp_valid = np.zeros((M,), bool)
    mp_first = np.full((M,), -1, np.int32)
    k = NR                        # newest keyframe row; neighbors are 0..9
    slot_k = 0
    next_mp = 0
    free_truth = []

    for r in range(NR):
        # neighbor r: lateral baseline, looking the same way
        kf_t[r] = np.array([0.3 * (1 + 0.03 * r), 0.0, 0.0], np.float32)
        # covisibility weight == covis_th for every neighbor (all ten tie
        # within the top-10; only their membership matters here)
        n_sh = N_SHARED
        pts_sh = np.stack([rng.uniform(-2, 2, n_sh),
                           rng.uniform(-1.5, 1.5, n_sh),
                           rng.uniform(4, 8, n_sh)], -1).astype(np.float32)
        pts_fr = np.stack([rng.uniform(-2, 2, N_FREE),
                           rng.uniform(-1.5, 1.5, N_FREE),
                           rng.uniform(4, 8, N_FREE)], -1).astype(np.float32)
        free_truth.append(pts_fr)
        descs = rng.integers(0, 2 ** 32, (n_sh + N_FREE, 8), dtype=np.uint32)
        slot_r = 0
        for j, p in enumerate(np.concatenate([pts_sh, pts_fr])):
            shared = j < n_sh
            uv_k = np.array(camera.project(
                cfg.camera, se3.apply(jnp.asarray(kf_q[k]),
                                      jnp.asarray(kf_t[k]), jnp.asarray(p))))
            uv_r = np.array(camera.project(
                cfg.camera, se3.apply(jnp.asarray(kf_q[r]),
                                      jnp.asarray(kf_t[r]), jnp.asarray(p))))
            kf_uv[k, slot_k], kf_uv[r, slot_r] = uv_k, uv_r
            kf_desc[k, slot_k] = kf_desc[r, slot_r] = descs[j]
            kf_kp_valid[k, slot_k] = kf_kp_valid[r, slot_r] = True
            if shared:
                mp_pos[next_mp], mp_valid[next_mp] = p, True
                mp_first[next_mp] = r
                kf_mp[k, slot_k] = kf_mp[r, slot_r] = next_mp
                next_mp += 1
            slot_k += 1
            slot_r += 1

    m = m._replace(
        kf_q=jnp.asarray(kf_q), kf_t=jnp.asarray(kf_t),
        kf_valid=jnp.zeros((K,), bool).at[:NR + 1].set(True),
        kf_uv=jnp.asarray(kf_uv), kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.asarray(kf_kp_valid), kf_mp=jnp.asarray(kf_mp),
        mp_pos=jnp.asarray(mp_pos), mp_valid=jnp.asarray(mp_valid),
        mp_first_kf=jnp.asarray(mp_first),
        n_kfs=jnp.int32(NR + 1), n_mps=jnp.int32(next_mp))

    m2, n_spawned = create_new_map_points(m, cfg)
    n_spawned = int(n_spawned)
    total = NR * N_FREE
    assert n_spawned >= 0.9 * total, (n_spawned, total)
    # spawned points land on the ground-truth free features
    new_pos = np.asarray(m2.mp_pos[next_mp:next_mp + n_spawned])
    truth = np.concatenate(free_truth)
    d = np.linalg.norm(new_pos[:, None, :] - truth[None], axis=-1)
    assert np.median(d.min(1)) < 0.05
    # every neighbor (including the LOWEST-covisibility one) contributed:
    # its free keypoints gained observations
    kf_mp2 = np.asarray(m2.kf_mp)
    for r in range(NR):
        assert (kf_mp2[r] >= next_mp).sum() >= 0.8 * N_FREE, r
