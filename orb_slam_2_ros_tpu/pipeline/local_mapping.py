"""Local mapping: windowed bundle adjustment + map-point culling.

Replaces the ``LocalMapping`` thread (``LocalMapping.cc``): instead of a
3 ms-polling consumer loop, the host invokes one jitted mapping step on a
cadence (after chunks that inserted keyframes — the software-pipelined
equivalent of SURVEY.md §2.D). The step:

1. new-landmark triangulation against covisible keyframes
   (``CreateNewMapPoints``, ``LocalMapping.cc:239-500``);
2. duplicate-landmark fusion (``SearchInNeighbors``, ``:502-582``);
3. local BA (``Optimizer::LocalBundleAdjustment``, ``Optimizer.cc:517-890``):
   the last ``window`` keyframes are free, ALL other keyframes are fixed
   (this subsumes the reference's fixed second ring — every observer outside
   the window constrains its points), points observed by the window are free;
4. outlier observation removal (edge chi2 gates, ``Optimizer.cc:781-860``);
5. map-point culling (``LocalMapping::MapPointCulling``,
   ``LocalMapping.cc:197-236``);
6. redundant-keyframe culling (``KeyFrameCulling``, ``:686-767``);
7. full point-stat refresh (normals/bands/descriptors + incremental pools).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_MONOCULAR
from orb_slam_2_ros_tpu.frontend import matcher
from orb_slam_2_ros_tpu.geometry import camera, se3, triangulate as tri
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.solvers import ba




def create_new_map_points(m: map_state.MapState, cfg: SlamConfig,
                          covis=None):
    """Triangulate new landmarks between the newest keyframe and its best
    covisible neighbors (``LocalMapping::CreateNewMapPoints``,
    ``LocalMapping.cc:239-500``): epipolar-gated descriptor matching of
    unmatched keypoints, batched DLT triangulation, then the reference's
    gate stack — cheirality, parallax, reprojection chi2 in both views,
    scale-ratio consistency — as one mask.

    TPU-shaped breadth: ALL ``tri_neighbors`` neighbors (the reference's
    10, doubled to 20 for monocular, ``LocalMapping.cc:247``) are matched
    and gated in ONE vmapped pass; a scatter-min then picks, per keypoint
    of the new keyframe, the surviving pair from the best-covisible
    neighbor (the reference reaches the same at-most-one-spawn-per-
    keypoint outcome sequentially: earlier neighbors claim the keypoint
    first). One spawn scatter pass total, instead of a full scatter storm
    per neighbor.

    Returns (m, n_spawned)."""
    K_int = camera.intrinsics(cfg.camera)
    R = cfg.map.tri_neighbors
    if cfg.sensor == SENSOR_MONOCULAR:
        R *= 2                      # nn=20 for mono (LocalMapping.cc:247)
    R = min(R, m.K)
    P = m.P
    k = jnp.maximum(m.n_kfs - 1, 0)
    if covis is None:
        covis = map_state.covisibility(m)
    w_top, idx_top = jax.lax.top_k(covis[k], R)

    # median scene depth of the new keyframe for the baseline gate
    # (ComputeSceneMedianDepth, KeyFrame.cc:767-817)
    pw = m.mp_pos[jnp.clip(m.kf_mp[k], 0)]
    z_k = se3.apply(m.kf_q[k], m.kf_t[k], pw)[:, 2]
    has = m.kf_mp[k] >= 0
    med_depth = jnp.median(jnp.where(has, z_k, jnp.nan))
    med_depth = jnp.nan_to_num(med_depth, nan=1.0)

    ratio_factor = 1.5 * cfg.orb.scale_factor
    ck = se3.camera_center(m.kf_q[k], m.kf_t[k])
    free_k = m.kf_kp_valid[k] & (m.kf_mp[k] < 0)
    Kinv = jnp.linalg.inv(K_int)
    P1 = tri.projection_matrix(K_int, m.kf_q[k], m.kf_t[k])

    def per_neighbor(n, w):
        """Match + triangulate + gate against ONE neighbor; returns
        per-n-keypoint (good, k-kp index, world point, neighbor center)."""
        cn = se3.camera_center(m.kf_q[n], m.kf_t[n])
        baseline = jnp.linalg.norm(ck - cn)
        if cfg.sensor == SENSOR_MONOCULAR:
            base_ok = baseline / jnp.maximum(med_depth, 1e-6) > 0.01
        else:
            base_ok = baseline > cfg.camera.bf / cfg.camera.fx
        neigh_ok = (w >= cfg.map.covis_th) & (n != k) \
            & m.kf_valid[n] & m.kf_valid[k] & base_ok

        # F12: x_n^T F x_k = 0 (ComputeF12, LocalMapping.cc:585-602)
        rq, rt = se3.relative(m.kf_q[n], m.kf_t[n], m.kf_q[k], m.kf_t[k])
        tx = jnp.array([[0, -rt[2], rt[1]],
                        [rt[2], 0, -rt[0]],
                        [-rt[1], rt[0], 0.0]])
        E = tx @ se3.quat_to_matrix(rq)
        F12 = Kinv.T @ E @ Kinv

        free_n = m.kf_kp_valid[n] & (m.kf_mp[n] < 0) & neigh_ok
        n_to_k, _ = matcher.search_for_triangulation(
            m.kf_desc[k], m.kf_uv[k], m.kf_ur[k], m.kf_octave[k],
            m.kf_angle[k], free_k,
            m.kf_desc[n], m.kf_uv[n], m.kf_ur[n], m.kf_octave[n],
            m.kf_angle[n], free_n, F12, cfg)

        pair = n_to_k >= 0                          # aligned on n's kp axis
        i_idx = jnp.clip(n_to_k, 0)
        uv_k = m.kf_uv[k][i_idx]
        uv_n = m.kf_uv[n]
        P2 = tri.projection_matrix(K_int, m.kf_q[n], m.kf_t[n])
        xw = tri.triangulate_dlt(P1, P2, uv_k, uv_n)

        # ---- gate stack (LocalMapping.cc:366-479)
        z1 = tri.depth_in_camera(m.kf_q[k], m.kf_t[k], xw)
        z2 = tri.depth_in_camera(m.kf_q[n], m.kf_t[n], xw)
        cosp = tri.parallax_cos(xw, ck, cn)
        pr1 = camera.project(cfg.camera, se3.apply(m.kf_q[k], m.kf_t[k], xw))
        pr2 = camera.project(cfg.camera, se3.apply(m.kf_q[n], m.kf_t[n], xw))
        s1 = cfg.orb.scale_factor ** m.kf_octave[k][i_idx].astype(jnp.float32)
        s2 = cfg.orb.scale_factor ** m.kf_octave[n].astype(jnp.float32)
        e1 = jnp.sum((pr1 - uv_k) ** 2, -1)
        e2 = jnp.sum((pr2 - uv_n) ** 2, -1)
        d1 = jnp.linalg.norm(xw - ck, axis=-1)
        d2 = jnp.linalg.norm(xw - cn, axis=-1)
        ratio = d2 / jnp.maximum(d1, 1e-9)
        ratio_oct = s1 / s2
        good = (pair & (z1 > 0) & (z2 > 0) & (cosp < 0.9998)
                & (e1 < 5.991 * s1 * s1) & (e2 < 5.991 * s2 * s2)
                & (ratio < ratio_oct * ratio_factor)
                & (ratio * ratio_factor > ratio_oct))
        return good, i_idx, xw, cn

    good_r, i_r, xw_r, cn_r = jax.vmap(per_neighbor)(idx_top, w_top)
    # good_r (R, P) on each neighbor's kp axis; i_r (R, P) k-kp targets

    # ---- winner per k-keypoint: lowest (rank, j) key — rank-major order
    # reproduces the reference's sequential first-claim semantics
    rr = jnp.arange(R, dtype=jnp.int32)[:, None]
    jj = jnp.arange(P, dtype=jnp.int32)[None, :]
    key = (rr * P + jj).ravel()
    slot = jnp.where(good_r.ravel(), i_r.ravel(), P)
    BIG = jnp.int32(0x7FFFFFFF)
    win_key = jnp.full((P + 1,), BIG, jnp.int32).at[slot].min(
        jnp.where(good_r.ravel(), key, BIG))[:P]
    won = win_key != BIG                            # (P,) per k-kp
    r_w = jnp.clip(win_key // P, 0, R - 1)
    j_w = jnp.clip(win_key % P, 0, P - 1)

    # ---- gather winner data onto k's keypoint axis
    i_k = jnp.arange(P, dtype=jnp.int32)
    xw = xw_r[r_w, j_w]                             # (P, 3)
    cn = cn_r[r_w]                                  # (P, 3)
    n_row = idx_top[r_w]                            # (P,) neighbor kf row

    # ---- predicated spawn into the point pool
    rank_i = jnp.cumsum(won.astype(jnp.int32)) - 1
    capacity = m.M - m.n_mps
    spawn = won & (rank_i < capacity)
    new_id = jnp.where(spawn, m.n_mps + rank_i, -1)
    tgt = jnp.where(spawn, new_id, m.M)

    d1 = jnp.linalg.norm(xw - ck, axis=-1)
    d2 = jnp.linalg.norm(xw - cn, axis=-1)
    dir1 = (xw - ck) / jnp.maximum(d1[:, None], 1e-9)
    dir2 = (xw - cn) / jnp.maximum(d2[:, None], 1e-9)
    nrm = dir1 + dir2
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1,
                                            keepdims=True), 1e-9)
    s1 = cfg.orb.scale_factor ** m.kf_octave[k][i_k].astype(jnp.float32)
    max_d = d1 * s1
    min_d = max_d / (cfg.orb.scale_factor ** (cfg.orb.n_levels - 1))

    def pad(pool):
        return jnp.concatenate([pool, jnp.zeros_like(pool[:1])], axis=0)

    desc_new = m.kf_desc[k][i_k]
    obs_tbl_new = (jnp.full((P, map_state.NOBS_DESC), -1, jnp.int32)
                   .at[:, 0].set(k * P + i_k)
                   .at[:, 1].set(n_row * P + j_w))
    m = m._replace(
        mp_pos=pad(m.mp_pos).at[tgt].set(xw)[:m.M],
        mp_valid=pad(m.mp_valid).at[tgt].set(spawn)[:m.M],
        mp_desc=pad(m.mp_desc).at[tgt].set(desc_new)[:m.M],
        mp_normal=pad(m.mp_normal).at[tgt].set(nrm)[:m.M],
        mp_min_dist=pad(m.mp_min_dist).at[tgt].set(0.8 * min_d)[:m.M],
        mp_max_dist=pad(m.mp_max_dist).at[tgt].set(1.2 * max_d)[:m.M],
        mp_first_kf=pad(m.mp_first_kf).at[tgt].set(
            jnp.full((P,), 1, jnp.int32) * k)[:m.M],
        mp_dir_sum=pad(m.mp_dir_sum).at[tgt].set(dir1 + dir2)[:m.M],
        mp_obs_cnt=pad(m.mp_obs_cnt).at[tgt].set(
            jnp.full((P,), 2, jnp.int32))[:m.M],
        mp_visible=pad(m.mp_visible).at[tgt].set(
            jnp.ones((P,), jnp.int32))[:m.M],
        mp_found=pad(m.mp_found).at[tgt].set(
            jnp.ones((P,), jnp.int32))[:m.M],
        mp_obs_tbl=pad(m.mp_obs_tbl).at[tgt].set(obs_tbl_new)[:m.M],
        # observations in BOTH keyframes: k's row by keypoint index, the
        # winning neighbor's by flat (row, kp) scatter
        kf_mp=m.kf_mp
        .at[k, jnp.where(spawn, i_k, P)].set(
            jnp.where(spawn, new_id, -1), mode="drop")
        .reshape(-1)
        .at[jnp.where(spawn, n_row * P + j_w, m.K * P)].set(
            jnp.where(spawn, new_id, -1), mode="drop")
        .reshape(m.K, P),
        n_mps=m.n_mps + jnp.sum(spawn.astype(jnp.int32)),
    )
    return m, jnp.sum(spawn.astype(jnp.int32))


def fuse_duplicates(m: map_state.MapState, cfg: SlamConfig,
                    n_neigh: int = None, covis=None):
    """Merge duplicate landmarks between the newest keyframe and its best
    covisible neighbors (``LocalMapping::SearchInNeighbors`` +
    ``ORBmatcher::Fuse``, ``LocalMapping.cc:502-582``,
    ``ORBmatcher.cc:827-977``): project each keyframe's points into the
    other, match by window + descriptor, and where a keypoint already
    references a different landmark, keep the one with more observations
    (``MapPoint::Replace`` semantics, ``MapPoint.cc:213-259``) via a
    replacement table applied to the whole observation table; free matched
    keypoints gain the observation instead.

    Returns (m, n_fused)."""
    if n_neigh is None:
        n_neigh = cfg.map.fuse_neighbors
    k = jnp.maximum(m.n_kfs - 1, 0)
    if covis is None:
        covis = map_state.covisibility(m)
    w_top, idx_top = jax.lax.top_k(covis[k], n_neigh)
    obs_cnt = map_state.observation_count(m)

    # landmark replacement map with an overflow slot at index M for
    # predicated (no-conflict) writes
    repl = jnp.arange(m.M + 1, dtype=jnp.int32)

    def kf_as_frame(row):
        """View keyframe `row`'s feature arrays as a Frame for the matcher."""
        from orb_slam_2_ros_tpu.frontend.extractor import Keypoints
        from orb_slam_2_ros_tpu.frontend.frame import Frame
        kps = Keypoints(
            xy=m.kf_uv[row], response=jnp.zeros((m.P,)),
            angle=m.kf_angle[row], octave=m.kf_octave[row],
            desc=m.kf_desc[row],
            valid=m.kf_kp_valid[row] & m.kf_valid[row])
        return Frame(kps=kps, uv=m.kf_uv[row], u_right=m.kf_ur[row],
                     depth=m.kf_depth[row])

    for rank in range(n_neigh):
        n = idx_top[rank]
        pair_ok = (w_top[rank] >= cfg.map.covis_th) & (n != k)
        for src, dst in ((k, n), (n, k)):
            # project src's landmarks into dst and match
            src_mp = m.kf_mp[src]
            has_src = (src_mp >= 0) & pair_ok
            frame = kf_as_frame(dst)
            kp_to_i, _ = matcher.search_by_projection_pose(
                m.mp_pos[jnp.clip(src_mp, 0)],
                m.mp_desc[jnp.clip(src_mp, 0)],
                m.kf_octave[src], has_src & m.mp_valid[jnp.clip(src_mp, 0)],
                m.kf_q[dst], m.kf_t[dst], frame, cfg, th=3.0,
                check_rotation=False)
            # kp j of dst matched to src keypoint i -> landmark src_mp[i]
            cand = jnp.where(kp_to_i >= 0,
                             src_mp[jnp.clip(kp_to_i, 0)], -1)
            dst_mp = m.kf_mp[dst]
            # case 1: dst keypoint free -> gain the observation
            gain = (cand >= 0) & (dst_mp < 0)
            m = m._replace(kf_mp=m.kf_mp.at[dst].set(
                jnp.where(gain, cand, dst_mp)))
            # case 2: conflict -> replace the weaker landmark everywhere
            conflict = (cand >= 0) & (dst_mp >= 0) & (cand != dst_mp)
            a = jnp.clip(cand, 0)
            b = jnp.clip(dst_mp, 0)
            # winner: more observations, ties broken toward the lower id so
            # both sweep directions agree (no replacement 2-cycles)
            keep_a = (obs_cnt[a] > obs_cnt[b]) | (
                (obs_cnt[a] == obs_cnt[b]) & (a < b))
            loser = jnp.where(keep_a, b, a)
            winner = jnp.where(keep_a, a, b)
            repl = repl.at[jnp.where(conflict, loser, m.M)].set(
                jnp.where(conflict, winner, m.M))

    # squash two-level replacement chains, then apply across the
    # observation table; invalidate losers
    repl = repl.at[m.M].set(m.M)
    repl = repl[repl]
    repl = repl[:m.M]
    replaced = repl != jnp.arange(m.M)
    n_fused = jnp.sum(replaced.astype(jnp.int32))
    kf_mp = jnp.where(m.kf_mp >= 0, repl[jnp.clip(m.kf_mp, 0)], -1)
    # Replace merges the loser's found/visible counters into the winner
    # (MapPoint::Replace, MapPoint.cc:229-233)
    wtgt = jnp.where(replaced, repl, m.M)
    vis = jnp.concatenate([m.mp_visible, jnp.zeros((1,), jnp.int32)]).at[
        wtgt].add(jnp.where(replaced, m.mp_visible, 0))[:m.M]
    fnd = jnp.concatenate([m.mp_found, jnp.zeros((1,), jnp.int32)]).at[
        wtgt].add(jnp.where(replaced, m.mp_found, 0))[:m.M]
    m = m._replace(kf_mp=kf_mp, mp_valid=m.mp_valid & ~replaced,
                   mp_visible=vis, mp_found=fnd)
    return m, n_fused


def cull_keyframes(m: map_state.MapState, cfg: SlamConfig, window: int = 20):
    """Remove redundant keyframes: >= 90% of a keyframe's landmarks observed
    by >= 3 other keyframes at the same or finer scale
    (``LocalMapping::KeyFrameCulling``, ``LocalMapping.cc:686-767``: an
    observation counts as redundant support only when the other keyframe
    sees the point at scale level <= own level + 1, ``:728-737``).

    Only keyframes inside the recent window (the reference culls covisible
    keyframes of the current one) excluding the newest and keyframe 0.
    Returns (m, n_culled)."""
    K = m.K
    rows = jnp.arange(K)
    n = m.n_kfs
    has_mp = (m.kf_mp >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    # per-point octave histogram -> cumulative count of observations at
    # level <= l, so the scale gate is one gather per observation
    L = cfg.orb.n_levels
    flat_mp = jnp.where(has_mp, m.kf_mp, m.M).ravel()
    flat_oct = jnp.clip(m.kf_octave, 0, L - 1).ravel()
    cnt_oct = jnp.zeros((m.M + 1, L), jnp.int32).at[flat_mp, flat_oct].add(
        (flat_mp < m.M).astype(jnp.int32))[:m.M]
    cnt_le = jnp.cumsum(cnt_oct, axis=-1)                     # (M, L)
    mp_idx = jnp.clip(m.kf_mp, 0)
    lvl_gate = jnp.clip(m.kf_octave + 1, 0, L - 1)
    n_support = jnp.take_along_axis(
        cnt_le[mp_idx].reshape(K, m.P, L), lvl_gate[..., None],
        axis=-1)[..., 0] - 1                                  # exclude self
    redundant_obs = has_mp & (n_support >= 3)
    n_obs = jnp.sum(has_mp.astype(jnp.int32), axis=1)
    n_red = jnp.sum(redundant_obs.astype(jnp.int32), axis=1)
    in_window = (rows >= n - window) & (rows < n - 1) & (rows > 0)
    cull = (m.kf_valid & in_window & (n_obs > 20)
            & (n_red.astype(jnp.float32)
               >= cfg.map.kf_cull_redundancy * n_obs.astype(jnp.float32)))
    m = m._replace(
        kf_valid=m.kf_valid & ~cull,
        kf_mp=jnp.where(cull[:, None], -1, m.kf_mp),
        kf_kp_valid=m.kf_kp_valid & ~cull[:, None])
    return m, jnp.sum(cull.astype(jnp.int32))


class LocalMapper:
    """Compiled mapping programs over the same map, gated on device.

    - FULL: triangulation + fusion + windowed BA + point/keyframe culling +
      compaction + stat refresh — the complete ``LocalMapping::Run`` body.
    - LIGHT: windowed BA + point culling + compaction only (kept for
      callers that want a cheaper refinement pass).

    Every step is wrapped in a ``lax.cond`` on "did a keyframe arrive since
    the previous step?" — the TPU-shaped equivalent of the reference's
    consumer thread sleeping while ``CheckNewKeyFrames()`` is empty
    (``LocalMapping.cc:50-126``). The System calls run() once per tracking
    chunk; chunks that inserted no keyframe cost one no-op cond dispatch
    instead of a full BA over an unchanged map.
    """

    def __init__(self, cfg: SlamConfig, window: int = 10,
                 triangulate_new_points: bool = True, mesh=None):
        self.cfg = cfg
        self.window = window
        # mesh (optional jax.sharding.Mesh): the windowed BA's compact
        # observation table row-shards over cfg.mesh.kf_axis and its
        # camera/landmark reductions psum over ICI
        # (parallel/dist_ba.distributed_windowed_ba, SURVEY.md §2.D)
        self.mesh = mesh
        if mesh is not None:
            n_row = mesh.shape[cfg.mesh.kf_axis]
            assert (2 * window) % n_row == 0, \
                f"2*window={2*window} must divide by kf-axis size {n_row}"
        # one compiled program pair per (config, window, ...) — not per
        # mapper (trace reuse; see tracking._compiled_track_chunk)
        if mesh is None:
            self._mapping_step_full, self._mapping_step_light = \
                _compiled_mapping_steps(cfg, window, triangulate_new_points)
        else:
            self._mapping_step_full, self._mapping_step_light = \
                _build_mapping_steps(cfg, window, triangulate_new_points,
                                     mesh)
        # post-step keyframe count from the previous run (device scalar);
        # -1 = never ran, first step always executes
        self._prev_n_kfs = jnp.int32(-1)
        # free-landmark count of the most recent BA step (device scalar;
        # fetch via last_ba_free_points). A value above
        # cfg.solver.local_ba_max_points means the compact landmark axis
        # overflowed and the excess points were frozen for that step.
        self._last_n_ba_free = jnp.int32(0)


    def run(self, m: map_state.MapState, last_mp: jnp.ndarray = None,
            allow_compact: bool = True, full: bool = True,
            force: bool = False):
        """One mapping step. Returns (new_map, n_culled, last_mp') where
        last_mp' is the caller's keypoint->map-point association vector
        re-indexed through the compaction remap (pass the tracker's
        ``carry.last_mp``; omitted -> a dummy is threaded through).
        allow_compact=False freezes point-pool ids (background GBA in
        flight); full=False runs the LIGHT program (BA + cull + compact).
        The step no-ops on device unless a keyframe arrived since the last
        step (force=True overrides, e.g. after a loop correction)."""
        if last_mp is None:
            last_mp = jnp.full((m.P,), -1, jnp.int32)
        step = self._mapping_step_full if full else self._mapping_step_light
        prev = jnp.int32(-1) if force else self._prev_n_kfs
        m, n_culled, last_mp, self._last_n_ba_free, self._prev_n_kfs = step(
            m, last_mp, jnp.asarray(allow_compact), prev)
        return m, n_culled, last_mp

    @property
    def last_ba_free_points(self) -> int:
        """Free-landmark count of the most recent executed BA step (0 when
        the step no-opped). Above cfg.solver.local_ba_max_points the
        compact axis overflowed: the excess landmarks stayed frozen.
        Host-synchronous fetch — debug/observability only."""
        return int(jax.device_get(self._last_n_ba_free))


@functools.lru_cache(maxsize=None)
def _compiled_mapping_steps(cfg: SlamConfig, window: int,
                            triangulate_new_points: bool):
    return _build_mapping_steps(cfg, window, triangulate_new_points, None)


def _build_mapping_steps(cfg: SlamConfig, window: int,
                         triangulate_new_points: bool, mesh):
        def _mapping_body(m: map_state.MapState, last_mp: jnp.ndarray,
                          allow_compact: jnp.ndarray, full: bool):
            K, P, M = m.K, m.P, m.M
            if full:
                # one covisibility build serves triangulation AND fusion —
                # the reference computes it once per keyframe too
                # (UpdateConnections in ProcessNewKeyFrame; both
                # CreateNewMapPoints and SearchInNeighbors then read
                # GetBestCovisibilityKeyFrames, LocalMapping.cc:247,:510)
                covis = map_state.covisibility(m)
                # new landmarks by triangulation against covisible keyframes
                # (CreateNewMapPoints, LocalMapping.cc:239-500) — the only
                # spawning path for monocular, far-point densifier otherwise
                if triangulate_new_points:
                    m, _ = create_new_map_points(m, cfg, covis=covis)
                # duplicate-landmark fusion in the neighborhood
                # (SearchInNeighbors, LocalMapping.cc:502-582)
                m, _ = fuse_duplicates(m, cfg, covis=covis)
            n = m.n_kfs
            # compact recent-rows table: only the last W2 keyframes enter the
            # BA edge set (the free window plus fixed recent observers —
            # ~the reference's fixed second ring; observers older than W2
            # anchor their points implicitly through the points' positions).
            # Iterating the full (K, P) pool costs ~4x more per LM iteration.
            W2 = min(2 * window, K)
            rows_idx = n - W2 + jnp.arange(W2)
            row_ok = (rows_idx >= 0) & m.kf_valid[jnp.clip(rows_idx, 0)]
            rows = jnp.clip(rows_idx, 0)
            c_uv = m.kf_uv[rows]
            c_ur = m.kf_ur[rows]
            c_oct = m.kf_octave[rows]
            c_mp = jnp.where(row_ok[:, None], m.kf_mp[rows], -1)
            c_kpv = m.kf_kp_valid[rows] & row_ok[:, None]
            c_q = m.kf_q[rows]
            c_t = m.kf_t[rows]
            # free cameras: the last `window` rows of the compact table
            w_local = W2 - window + jnp.arange(window)
            w_ok = row_ok[w_local] & (rows_idx[w_local] > 0)
            window_rows = jnp.where(w_ok, w_local, -1).astype(jnp.int32)

            # free points = observed by at least one window keyframe
            in_win_row = jnp.zeros((W2,), bool).at[w_local].set(w_ok)
            obs = jnp.where(in_win_row[:, None] & (c_mp >= 0), c_mp, M)
            mp_free = jnp.zeros((M + 1,), bool).at[obs.ravel()].set(True)[:M]
            mp_free = mp_free & m.mp_valid

            ba_phases = (cfg.solver.local_ba_iters1,
                         cfg.solver.local_ba_iters2)
            if mesh is not None:
                from orb_slam_2_ros_tpu.parallel import dist_ba
                q_c, t_c, pos, edge_inl, edge_loose, n_ba_free = \
                    dist_ba.distributed_windowed_ba(
                        mesh, c_q, c_t, window_rows, c_uv, c_ur, c_oct,
                        c_mp, c_kpv, m.mp_pos, mp_free, cfg,
                        phases=ba_phases)
            else:
                q_c, t_c, pos, edge_inl, edge_loose, n_ba_free = \
                    ba.windowed_bundle_adjustment(
                        c_q, c_t, window_rows, c_uv, c_ur, c_oct, c_mp,
                        c_kpv, m.mp_pos, mp_free, cfg, phases=ba_phases)

            # write back window poses and drop outlier observations at the
            # standard chi2 gate for every participating row
            # (Optimizer.cc:781-860). Deliberately strict: retention
            # variants were measured end-to-end and every one of them made
            # things WORSE — keeping fixed-row borderline edges (whether
            # unpruned, loose-gated, or entry-down-weighted in the BA
            # cost) preserved ~4x more observations on old keyframes but
            # doubled odometric drift AND broke loop acceptance (the kept
            # stale associations feed bad 3D pairs into the Sim3 ladder).
            # The two-phase OptimizeSim3 works from the leaner association
            # set (solvers/sim3_solver.py).
            scat_rows = jnp.where(row_ok, rows, K)
            kf_q = m.kf_q.at[scat_rows].set(q_c, mode="drop")
            kf_t = m.kf_t.at[scat_rows].set(t_c, mode="drop")
            had_edge = (c_mp >= 0) & c_kpv
            c_mp_new = jnp.where(had_edge & ~edge_inl, -1, c_mp)
            kf_mp = m.kf_mp.at[scat_rows].set(
                jnp.where(row_ok[:, None], c_mp_new, m.kf_mp[rows]),
                mode="drop")
            m = m._replace(kf_q=kf_q, kf_t=kf_t, mp_pos=pos, kf_mp=kf_mp)

            # map-point culling: old points with too few surviving
            # observations; the reference keeps mono points at >= 2
            # observations, stereo/RGB-D at >= 3 (LocalMapping.cc:209)
            cull_th = (2 if cfg.sensor == SENSOR_MONOCULAR
                       else cfg.map.min_obs_cull)
            cnt = map_state.observation_count(m)
            age = n - m.mp_first_kf     # in keyframes
            # found-ratio clause (GetFoundRatio() < 0.25f,
            # LocalMapping.cc:221): the reference applies it ONLY while the
            # point sits in the recently-added list (it leaves after 3
            # keyframes, LocalMapping.cc:229-231). Applying it forever —
            # tried in an earlier round — silently starves the observation
            # graph: on sweeping trajectories old landmarks stay
            # frustum-visible long after their matched window, the ratio
    	    # decays below 0.25, and well-observed points get culled,
            # leaving the global BA ill-conditioned (~3x fewer edges).
            ratio = (m.mp_found.astype(jnp.float32)
                     / jnp.maximum(m.mp_visible, 1).astype(jnp.float32))
            weak = (age <= 3) & (m.mp_visible >= 8) & (ratio < 0.25)
            cull = m.mp_valid & (((age >= 3) & (cnt < cull_th)) | weak)
            m = m._replace(mp_valid=m.mp_valid & ~cull)
            kf_mp2 = jnp.where(
                (m.kf_mp >= 0) & cull[jnp.clip(m.kf_mp, 0)], -1, m.kf_mp)
            m = m._replace(kf_mp=kf_mp2)

            # redundant-keyframe culling (KeyFrameCulling,
            # LocalMapping.cc:686-767)
            if full:
                m, _ = cull_keyframes(m, cfg, window=window)

            # point-pool compaction: recycle culled/fused rows so n_mps is
            # a live count, not a monotone allocator (Map::EraseMapPoint,
            # Map.cc:69-78; SURVEY.md §7.0 free-lists). The tracker's
            # last-frame associations ride through the remap. Predicated
            # off while a background GBA is in flight — its snapshot indexes
            # the point pool, so ids must stay stable until it reconciles
            # (the reference's mnBAGlobalForKF bookkeeping plays this role).
            m_c, remap = map_state.compact_points(m)
            m = jax.tree_util.tree_map(
                lambda new, old: jnp.where(allow_compact, new, old), m_c, m)
            remap = jnp.where(allow_compact, remap,
                              jnp.arange(m.M, dtype=jnp.int32))
            last_mp = jnp.where(last_mp >= 0,
                                remap[jnp.clip(last_mp, 0)], -1)

            if full:
                m = map_state.refresh_point_stats(m, cfg)
            return m, jnp.sum(cull.astype(jnp.int32)), last_mp, n_ba_free

        def _mapping_step(m: map_state.MapState, last_mp: jnp.ndarray,
                          allow_compact: jnp.ndarray,
                          prev_n_kfs: jnp.ndarray, full: bool):
            """Device-gated step: the body only executes when a keyframe was
            inserted since the previous step (``m.n_kfs`` moved past the
            post-step count the mapper returned last time). The reference's
            LocalMapping thread idles exactly the same way — its Run loop
            does nothing while ``CheckNewKeyFrames()`` is empty
            (``LocalMapping.cc:50-126``); rerunning local BA on an unchanged
            map buys nothing. ``lax.cond`` keeps the check on device: the
            host dispatch pattern stays fixed, no blocking scalar fetch."""
            def run_branch(args):
                return _mapping_body(*args, full)

            def skip_branch(args):
                m, last_mp, _ = args
                return m, jnp.int32(0), last_mp, jnp.int32(0)

            m, n_culled, last_mp, n_ba_free = jax.lax.cond(
                m.n_kfs > prev_n_kfs, run_branch, skip_branch,
                (m, last_mp, allow_compact))
            return m, n_culled, last_mp, n_ba_free, m.n_kfs

        return (jax.jit(
            lambda m, lmp, ac, pn: _mapping_step(m, lmp, ac, pn, True)),
            jax.jit(
            lambda m, lmp, ac, pn: _mapping_step(m, lmp, ac, pn, False)))

