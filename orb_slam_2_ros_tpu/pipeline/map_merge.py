"""Multi-session map merging: align a second session's map into the first.

The reference is single-session (its only cross-session mechanism is
save/load + relocalization, ``System::LoadMap``); the multi-session joint
map is this framework's extension for the distributed/multi-host
configuration (BASELINE.md north star: EuRoC multi-session). The merge is
place-recognition driven, reusing the loop-closing machinery:

1. every keyframe of map A enters a BoW database;
2. map B's keyframes query it; the best-scoring candidate pair is matched
   by descriptor (the ``SearchByBoW`` analog) and their common landmarks
   feed a Horn-RANSAC Sim3 directly between the two WORLD frames
   (``Sim3Solver`` on world points instead of camera points);
3. on acceptance, map B's pytree is re-expressed through the Sim3 and
   appended into map A's pools (keyframe rows, point rows, observation
   ids offset);
4. the seam is left to the standard pipeline: the next loop-closing pass
   detects the revisit between the sessions and runs the usual fusion +
   essential graph + global BA (``LoopCloser.process``).

Host-level orchestration (merging is rare); the heavy pieces (BoW
transform, Hamming matching, RANSAC) are the existing jitted kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.frontend import matcher
from orb_slam_2_ros_tpu.geometry import se3, sim3
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.place import database, vocabulary
from orb_slam_2_ros_tpu.solvers import sim3_solver

MIN_MERGE_INLIERS = 20    # Sim3 accept gate (mirrors LoopClosing.cc:439)


def _ingest_all(m: map_state.MapState, vocab, cfg: SlamConfig):
    """BoW rows for every valid keyframe of a map."""
    db = database.empty(cfg)
    n = int(jax.device_get(m.n_kfs))

    @jax.jit
    def one(db, row):
        wid, nid, tfidf = vocabulary.transform(
            vocab, m.kf_desc[row], m.kf_kp_valid[row] & m.kf_valid[row])
        wt = vocabulary.bow_weights(wid, tfidf, vocab.num_words)
        return database.add(db, row, wid, wt,
                            enable=m.kf_valid[row]), wid, wt

    words, wts = [], []
    for k in range(n):
        db, wid, wt = one(db, jnp.int32(k))
        words.append(wid)
        wts.append(wt)
    return db, words, wts


def align_sim3(m1: map_state.MapState, m2: map_state.MapState,
               vocab, cfg: SlamConfig, key,
               fix_scale: bool = True):
    """Find the world-to-world Sim3 ``x1 ~ S(x2)`` via place recognition.

    Returns (ok, q, t, s, n_inliers, (kf1, kf2)) — the transform mapping
    map-2 world coordinates into map 1's frame.
    """
    db1, _, _ = _ingest_all(m1, vocab, cfg)
    n2 = int(jax.device_get(m2.n_kfs))

    @jax.jit
    def query_row(row):
        wid, nid, tfidf = vocabulary.transform(
            vocab, m2.kf_desc[row], m2.kf_kp_valid[row] & m2.kf_valid[row])
        wt = vocabulary.bow_weights(wid, tfidf, vocab.num_words)
        scores, shared = database.query(db1, wid, wt, vocab.num_words)
        scores = jnp.where(db1.kf_valid, scores, -1.0)
        return jnp.argmax(scores), jnp.max(scores)

    best = (-1, -1, -1.0)
    for k2 in range(n2):
        c1, s = query_row(jnp.int32(k2))
        s = float(jax.device_get(s))
        if s > best[2]:
            best = (int(jax.device_get(c1)), k2, s)
    c1, k2, score = best
    if c1 < 0:
        return False, None, None, None, 0, (c1, k2)

    @jax.jit
    def solve(key):
        valid_1 = m1.kf_kp_valid[c1] & (m1.kf_mp[c1] >= 0) & m1.kf_valid[c1]
        valid_2 = m2.kf_kp_valid[k2] & (m2.kf_mp[k2] >= 0) & m2.kf_valid[k2]
        # brute descriptor matching between the two keyframes (the BoW node
        # gate only prunes on CPU; the full masked Hamming matrix is one
        # MXU matmul — see matcher.search_reference_kf)
        two_to_one, _ = matcher.search_by_node(
            m1.kf_desc[c1], jnp.zeros((m1.P,), jnp.int32), valid_1,
            m1.kf_angle[c1],
            m2.kf_desc[k2], jnp.zeros((m2.P,), jnp.int32), valid_2,
            m2.kf_angle[k2], cfg)
        pair_ok = two_to_one >= 0
        i1 = jnp.clip(two_to_one, 0)
        mp1 = m1.kf_mp[c1][i1]
        mp2 = m2.kf_mp[k2]
        pair_ok = pair_ok & (mp1 >= 0) & (mp2 >= 0)
        # world-frame landmark pairs: estimate S with x1w ~ S(x2w).
        # Inlier check uses mutual projection into the two keyframes like
        # Sim3Solver::CheckInliers, expressed through the composed poses.
        x1w = m1.mp_pos[jnp.clip(mp1, 0)]
        x2w = m2.mp_pos[jnp.clip(mp2, 0)]
        x1c = se3.apply(m1.kf_q[c1], m1.kf_t[c1], x1w)
        x2c = se3.apply(m2.kf_q[k2], m2.kf_t[k2], x2w)
        uv1 = m1.kf_uv[c1][i1]
        uv2 = m2.kf_uv[k2]
        q12, t12, s12, inl, n_inl = sim3_solver.ransac_sim3(
            x1c, x2c, pair_ok, uv1, uv2, cfg, key, fix_scale=fix_scale)
        q12, t12, s12, inl, n_inl = sim3_solver.refine_sim3_lm(
            q12, t12, s12, x1c, x2c, uv1, uv2, pair_ok, cfg,
            fix_scale=fix_scale)
        # S_w1<-w2 = T1w^-1 * S_c1<-c2 * T2w (camera-frame Sim3 lifted to
        # the world frames through the two keyframe poses)
        S1 = sim3.from_se3(m1.kf_q[c1], m1.kf_t[c1])
        S2 = sim3.from_se3(m2.kf_q[k2], m2.kf_t[k2])
        qw, tw, sw = sim3.compose(*sim3.inverse(*S1),
                                  *sim3.compose(q12, t12, s12, *S2))
        return qw, tw, sw, n_inl

    qw, tw, sw, n_inl = solve(key)
    n_inl = int(jax.device_get(n_inl))
    ok = n_inl >= MIN_MERGE_INLIERS
    return ok, qw, tw, sw, n_inl, (c1, k2)


def transform_map(m: map_state.MapState, q, t, s) -> map_state.MapState:
    """Re-express a map through a world Sim3 y = S(x): points move with S,
    keyframe centers move with S, rotations pick up R_S^-1 (projections are
    invariant to the leftover uniform camera-frame scaling, which is how
    mono scale enters)."""
    pos = sim3.apply(q, t, s, m.mp_pos)
    centers = se3.camera_center(m.kf_q, m.kf_t)
    c_new = sim3.apply(q, t, s, centers)
    q_new = se3.quat_mul(m.kf_q, se3.quat_conj(q)[None, :])
    t_new = -se3.quat_rotate(q_new, c_new)
    # scale-invariance distance bands scale with the world
    return m._replace(
        mp_pos=pos, kf_q=se3.quat_normalize(q_new), kf_t=t_new,
        mp_min_dist=m.mp_min_dist * s, mp_max_dist=m.mp_max_dist * s,
        mp_normal=se3.quat_rotate(q[None, :], m.mp_normal))


def concat_maps(m1: map_state.MapState,
                m2: map_state.MapState) -> map_state.MapState:
    """Append m2's valid keyframes/points into m1's pools (ids offset).

    Capacities must hold both maps (raise otherwise — growing pools means
    re-jitting every consumer)."""
    n1 = int(jax.device_get(m1.n_kfs))
    n2 = int(jax.device_get(m2.n_kfs))
    p1 = int(jax.device_get(m1.n_mps))
    p2 = int(jax.device_get(m2.n_mps))
    if n1 + n2 > m1.K or p1 + p2 > m1.M:
        raise ValueError(
            f"merged map exceeds pool capacity: {n1}+{n2} KFs of {m1.K}, "
            f"{p1}+{p2} points of {m1.M}")
    P = m1.P

    def cat_rows(a, b):
        return jax.lax.dynamic_update_slice_in_dim(
            a, jax.lax.dynamic_slice_in_dim(b, 0, n2, 0), n1, 0)

    def cat_pts(a, b):
        return jax.lax.dynamic_update_slice_in_dim(
            a, jax.lax.dynamic_slice_in_dim(b, 0, p2, 0), p1, 0)

    kf_mp2 = jnp.where(m2.kf_mp >= 0, m2.kf_mp + p1, -1)
    tbl2 = jnp.where(m2.mp_obs_tbl >= 0, m2.mp_obs_tbl + n1 * P, -1)
    first2 = jnp.where(m2.mp_first_kf >= 0, m2.mp_first_kf + n1, -1)
    m = m1._replace(
        kf_q=cat_rows(m1.kf_q, m2.kf_q),
        kf_t=cat_rows(m1.kf_t, m2.kf_t),
        kf_valid=cat_rows(m1.kf_valid, m2.kf_valid),
        kf_frame_id=cat_rows(m1.kf_frame_id, m2.kf_frame_id),
        kf_uv=cat_rows(m1.kf_uv, m2.kf_uv),
        kf_ur=cat_rows(m1.kf_ur, m2.kf_ur),
        kf_depth=cat_rows(m1.kf_depth, m2.kf_depth),
        kf_octave=cat_rows(m1.kf_octave, m2.kf_octave),
        kf_angle=cat_rows(m1.kf_angle, m2.kf_angle),
        kf_desc=cat_rows(m1.kf_desc, m2.kf_desc),
        kf_kp_valid=cat_rows(m1.kf_kp_valid, m2.kf_kp_valid),
        kf_mp=cat_rows(m1.kf_mp, kf_mp2),
        mp_pos=cat_pts(m1.mp_pos, m2.mp_pos),
        mp_valid=cat_pts(m1.mp_valid, m2.mp_valid),
        mp_desc=cat_pts(m1.mp_desc, m2.mp_desc),
        mp_normal=cat_pts(m1.mp_normal, m2.mp_normal),
        mp_min_dist=cat_pts(m1.mp_min_dist, m2.mp_min_dist),
        mp_max_dist=cat_pts(m1.mp_max_dist, m2.mp_max_dist),
        mp_first_kf=cat_pts(m1.mp_first_kf, first2),
        mp_dir_sum=cat_pts(m1.mp_dir_sum, m2.mp_dir_sum),
        mp_obs_cnt=cat_pts(m1.mp_obs_cnt, m2.mp_obs_cnt),
        mp_visible=cat_pts(m1.mp_visible, m2.mp_visible),
        mp_found=cat_pts(m1.mp_found, m2.mp_found),
        mp_obs_tbl=cat_pts(m1.mp_obs_tbl, tbl2),
        n_kfs=jnp.int32(n1 + n2),
        n_mps=jnp.int32(p1 + p2),
    )
    return m


def merge_maps(m1: map_state.MapState, m2: map_state.MapState,
               vocab, cfg: SlamConfig, key=None,
               fix_scale: bool = True
               ) -> Tuple[Optional[map_state.MapState], dict]:
    """Full merge: align (place recognition + Sim3) and concatenate.

    Returns (merged map or None, info dict). Run a ``LoopCloser`` over the
    result to weld the seam (duplicate fusion + essential graph + GBA) —
    the sessions meet exactly like a loop closure.
    """
    if key is None:
        key = jax.random.PRNGKey(cfg.seed + 7)
    ok, q, t, s, n_inl, pair = align_sim3(m1, m2, vocab, cfg, key,
                                          fix_scale=fix_scale)
    info = {"aligned": ok, "inliers": n_inl, "pair": pair}
    if not ok:
        return None, info
    m2t = transform_map(m2, q, t, s)
    merged = concat_maps(m1, m2t)
    merged = map_state.refresh_point_stats(merged, cfg)
    info["sim3"] = (np.asarray(jax.device_get(q)),
                    np.asarray(jax.device_get(t)),
                    float(jax.device_get(s) if np.ndim(s) == 0
                          else jax.device_get(s)[0]))
    return merged, info
