"""MapState: the whole SLAM map as one pytree of fixed-shape arrays.

Functional analog of ``Map`` + ``KeyFrame`` + ``MapPoint`` (§2.12-2.14 of
SURVEY.md). Keyframes are rows of pooled arrays (pose, features, and the
kp->map-point observation table ``kf_mp``); map points are rows of point
pools. Everything the reference maintains incrementally under mutexes
(observation maps ``MapPoint.cc:122-165``, covisibility weights
``KeyFrame.cc:344-460``, viewing normals and scale bands
``MapPoint.cc:388-452``) is recomputed here from the observation table in
single batched passes — cheap on TPU, and trivially consistent.

The observation table ``kf_mp (K, P) int32`` IS the edge list for bundle
adjustment: edge (k, p) exists iff kf_mp[k, p] >= 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.frontend.frame import Frame
from orb_slam_2_ros_tpu.geometry import se3


class MapState(NamedTuple):
    # --- keyframe pool (K rows) ---
    kf_q: jnp.ndarray        # (K, 4) world->camera rotation
    kf_t: jnp.ndarray        # (K, 3)
    kf_valid: jnp.ndarray    # (K,) bool
    kf_frame_id: jnp.ndarray  # (K,) int32 source frame index
    # per-keyframe features (frozen copy of the source Frame)
    kf_uv: jnp.ndarray       # (K, P, 2) undistorted
    kf_ur: jnp.ndarray       # (K, P) right coord or -1
    kf_depth: jnp.ndarray    # (K, P) metric depth or -1
    kf_octave: jnp.ndarray   # (K, P) int32
    kf_angle: jnp.ndarray    # (K, P) float32
    kf_desc: jnp.ndarray     # (K, P, 8) uint32
    kf_kp_valid: jnp.ndarray  # (K, P) bool
    kf_mp: jnp.ndarray       # (K, P) int32 map-point id or -1  [observations]
    # --- map-point pool (M rows) ---
    mp_pos: jnp.ndarray      # (M, 3) world
    mp_valid: jnp.ndarray    # (M,) bool
    mp_desc: jnp.ndarray     # (M, 8) uint32 representative descriptor
    mp_normal: jnp.ndarray   # (M, 3) mean viewing direction
    mp_min_dist: jnp.ndarray  # (M,) scale-invariance band
    mp_max_dist: jnp.ndarray  # (M,)
    mp_first_kf: jnp.ndarray  # (M,) int32 creating keyframe
    mp_dir_sum: jnp.ndarray   # (M, 3) running sum of unit viewing directions
    mp_obs_cnt: jnp.ndarray   # (M,) int32 running observation count
    # tracking-visibility bookkeeping (``MapPoint::IncreaseVisible`` /
    # ``IncreaseFound`` / ``GetFoundRatio``, ``MapPoint.cc:268-283``):
    # visible += 1 whenever the tracker's frustum pass sees the point,
    # found += 1 when the point survives the frame's pose optimization as
    # an inlier; the found/visible ratio feeds map-point culling
    # (``LocalMapping.cc:221``). Both start at 1 (``MapPoint.h`` ctor).
    mp_visible: jnp.ndarray   # (M,) int32
    mp_found: jnp.ndarray     # (M,) int32
    # ring buffer of the point's most recent observations as flat indices
    # kf * P + kp (or -1): feeds the representative-descriptor selection
    # without sorting the whole observation table (entries may go stale
    # after fusion/culling — consumers re-validate against kf_mp)
    mp_obs_tbl: jnp.ndarray   # (M, NOBS_DESC) int32
    # --- counters ---
    n_kfs: jnp.ndarray       # () int32 next keyframe row
    n_mps: jnp.ndarray       # () int32 next map-point row (monotone alloc)

    @property
    def K(self):
        return self.kf_q.shape[0]

    @property
    def M(self):
        return self.mp_pos.shape[0]

    @property
    def P(self):
        return self.kf_uv.shape[1]


def empty(cfg: SlamConfig) -> MapState:
    K, M, P = cfg.map.max_kfs, cfg.map.max_mps, cfg.map.max_kps
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_q=jnp.tile(jnp.array([1.0, 0, 0, 0], f32), (K, 1)),
        kf_t=jnp.zeros((K, 3), f32),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, i32),
        kf_uv=jnp.zeros((K, P, 2), f32),
        kf_ur=jnp.full((K, P), -1.0, f32),
        kf_depth=jnp.full((K, P), -1.0, f32),
        kf_octave=jnp.zeros((K, P), i32),
        kf_angle=jnp.zeros((K, P), f32),
        kf_desc=jnp.zeros((K, P, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, P), bool),
        kf_mp=jnp.full((K, P), -1, i32),
        mp_pos=jnp.zeros((M, 3), f32),
        mp_valid=jnp.zeros((M,), bool),
        mp_desc=jnp.zeros((M, 8), jnp.uint32),
        mp_normal=jnp.zeros((M, 3), f32),
        mp_min_dist=jnp.zeros((M,), f32),
        mp_max_dist=jnp.full((M,), 1e9, f32),
        mp_first_kf=jnp.full((M,), -1, i32),
        mp_dir_sum=jnp.zeros((M, 3), f32),
        mp_obs_cnt=jnp.zeros((M,), i32),
        mp_visible=jnp.ones((M,), i32),
        mp_found=jnp.ones((M,), i32),
        mp_obs_tbl=jnp.full((M, NOBS_DESC), -1, i32),
        n_kfs=jnp.zeros((), i32),
        n_mps=jnp.zeros((), i32),
    )


def insert_keyframe(state: MapState, frame: Frame, q, t, frame_id,
                    kp_to_mp: jnp.ndarray):
    """Append the frame as keyframe row ``n_kfs`` with its current map-point
    associations (``Tracking::CreateNewKeyFrame``, ``Tracking.cc:1204-1219``).

    Returns (state, kf_id). Does NOT spawn new points — see spawn_points.
    """
    k = state.n_kfs
    state = state._replace(
        kf_q=state.kf_q.at[k].set(q),
        kf_t=state.kf_t.at[k].set(t),
        kf_valid=state.kf_valid.at[k].set(True),
        kf_frame_id=state.kf_frame_id.at[k].set(frame_id),
        kf_uv=state.kf_uv.at[k].set(frame.uv),
        kf_ur=state.kf_ur.at[k].set(frame.u_right),
        kf_depth=state.kf_depth.at[k].set(frame.depth),
        kf_octave=state.kf_octave.at[k].set(frame.kps.octave),
        kf_angle=state.kf_angle.at[k].set(frame.kps.angle),
        kf_desc=state.kf_desc.at[k].set(frame.kps.desc),
        kf_kp_valid=state.kf_kp_valid.at[k].set(frame.kps.valid),
        kf_mp=state.kf_mp.at[k].set(jnp.where(frame.kps.valid, kp_to_mp, -1)),
        n_kfs=k + 1,
    )
    # record the associations in the per-point observation ring buffer
    P = state.P
    kp_mp = jnp.where(frame.kps.valid, kp_to_mp, -1)
    obs_mask = kp_mp >= 0
    mp_ids = jnp.where(obs_mask, kp_mp, state.M)
    slot = state.mp_obs_cnt[jnp.clip(kp_mp, 0)] % NOBS_DESC
    flat_idx = k * P + jnp.arange(P, dtype=jnp.int32)
    tbl = jnp.concatenate([state.mp_obs_tbl,
                           jnp.zeros((1, NOBS_DESC), jnp.int32)], axis=0)
    cnt = jnp.concatenate([state.mp_obs_cnt, jnp.zeros((1,), jnp.int32)])
    state = state._replace(
        mp_obs_tbl=tbl.at[mp_ids, slot].set(flat_idx)[:state.M],
        mp_obs_cnt=cnt.at[mp_ids].add(obs_mask.astype(jnp.int32))[:state.M])
    return state, k


def spawn_points(state: MapState, kf_id, cfg: SlamConfig,
                 close_only: bool = True, max_spawn: int = 512):
    """Create map points from the keyframe's depth channel for keypoints not
    yet associated (``Tracking::CreateNewKeyFrame`` depth-sorted spawning,
    ``Tracking.cc:1240-1296``; ``StereoInitialization`` spawns everything,
    ``Tracking.cc:565-590``).

    close_only limits to depth < th_depth * baseline like the reference's
    close/far split; the nearest ``max_spawn`` eligible points are spawned
    (static cap replacing the reference's dynamic 100-point top-up).
    """
    cam = cfg.camera
    P = state.P
    depth = state.kf_depth[kf_id]
    eligible = (state.kf_kp_valid[kf_id] & (depth > 0) & (state.kf_mp[kf_id] < 0))
    if close_only:
        th_close = cam.bf / cam.fx * cam.th_depth
        eligible = eligible & (depth < th_close)

    # nearest-first static cap: rank eligible keypoints by depth
    rank_key = jnp.where(eligible, depth, jnp.inf)
    order = jnp.argsort(rank_key)                       # eligible first, by depth
    ranks = jnp.zeros((P,), jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
    capacity_left = state.M - state.n_mps
    spawn = eligible & (ranks < max_spawn) & (ranks < capacity_left)
    new_id = jnp.where(spawn, state.n_mps + ranks, -1)

    # backproject to world
    q, t = state.kf_q[kf_id], state.kf_t[kf_id]
    uv = state.kf_uv[kf_id]
    xy = (uv - jnp.array([cam.cx, cam.cy])) / jnp.array([cam.fx, cam.fy])
    xc = jnp.concatenate([xy * depth[:, None], depth[:, None]], axis=-1)
    qi, ti = se3.inverse(q, t)
    xw = se3.apply(qi, ti, xc)

    tgt = jnp.where(spawn, new_id, state.M)  # overflow row for non-spawns
    ow = se3.camera_center(q, t)
    dirs = xw - ow
    dist = jnp.linalg.norm(dirs, axis=-1)
    sf = cfg.orb.scale_factor ** state.kf_octave[kf_id].astype(jnp.float32)
    max_d = dist * sf
    min_d = max_d / (cfg.orb.scale_factor ** (cfg.orb.n_levels - 1))

    def scat(pool, vals):
        padded = jnp.concatenate([pool, jnp.zeros_like(pool[:1])], axis=0)
        return padded.at[tgt].set(vals)[:-1]

    state = state._replace(
        mp_pos=scat(state.mp_pos, xw),
        mp_valid=scat(state.mp_valid, spawn),
        mp_desc=scat(state.mp_desc, state.kf_desc[kf_id]),
        mp_normal=scat(state.mp_normal, dirs / jnp.maximum(dist[:, None], 1e-9)),
        mp_min_dist=scat(state.mp_min_dist, 0.8 * min_d),
        mp_max_dist=scat(state.mp_max_dist, 1.2 * max_d),
        mp_first_kf=scat(state.mp_first_kf, jnp.full((P,), 1, jnp.int32) * kf_id),
        mp_dir_sum=scat(state.mp_dir_sum, dirs / jnp.maximum(dist[:, None], 1e-9)),
        mp_obs_cnt=scat(state.mp_obs_cnt, jnp.ones((P,), jnp.int32)),
        mp_visible=scat(state.mp_visible, jnp.ones((P,), jnp.int32)),
        mp_found=scat(state.mp_found, jnp.ones((P,), jnp.int32)),
        mp_obs_tbl=scat(state.mp_obs_tbl,
                        jnp.full((P, NOBS_DESC), -1, jnp.int32).at[:, 0].set(
                            kf_id * P + jnp.arange(P, dtype=jnp.int32))),
        kf_mp=state.kf_mp.at[kf_id].set(
            jnp.where(spawn, new_id, state.kf_mp[kf_id])),
        n_mps=state.n_mps + jnp.sum(spawn.astype(jnp.int32)),
    )
    return state


def bump_visibility(state: MapState, visible_mask: jnp.ndarray,
                    found_ids: jnp.ndarray, enable) -> MapState:
    """One batched tracking-visibility update per frame
    (``MapPoint::IncreaseVisible`` at ``Tracking.cc:1330-1352``,
    ``IncreaseFound`` at ``Tracking.cc:1066-1072``; counters defined at
    ``MapPoint.cc:268-283``): every point the frustum pass saw gets
    visible += 1; every final pose-optimization inlier gets found += 1.

    visible_mask (M,) bool; found_ids (P,) kp->map-point ids (-1 = none);
    enable () bool gates the whole update (inactive / pre-init frames).
    """
    M = state.M
    vis = state.mp_visible + (visible_mask & enable).astype(jnp.int32)
    tgt = jnp.where((found_ids >= 0) & enable, found_ids, M)
    fnd = jnp.concatenate([state.mp_found, jnp.zeros((1,), jnp.int32)])
    fnd = fnd.at[tgt].add(1)[:M]
    return state._replace(mp_visible=vis, mp_found=fnd)


def observation_count(state: MapState) -> jnp.ndarray:
    """(M,) number of keyframes observing each map point."""
    obs = jnp.where(state.kf_valid[:, None], state.kf_mp, -1)
    flat = obs.ravel()
    ok = flat >= 0
    tgt = jnp.where(ok, flat, state.M)
    cnt = jnp.zeros((state.M + 1,), jnp.int32).at[tgt].add(ok.astype(jnp.int32))
    return cnt[:state.M]


NOBS_DESC = 8   # newest observations considered per point when selecting the
                # representative descriptor (MapPoint.cc:288-361 uses all)


def _distinctive_descriptors(obs_tbl: jnp.ndarray, have: jnp.ndarray,
                             desc_flat: jnp.ndarray) -> jnp.ndarray:
    """Per map point, the observation descriptor with minimum median Hamming
    distance to that point's other observations
    (``MapPoint::ComputeDistinctiveDescriptors``, ``MapPoint.cc:288-361``),
    batched over the whole pool from the per-point observation ring buffer
    (``mp_obs_tbl`` — the newest NOBS_DESC observations; maintaining it
    incrementally replaces a lexsort of the whole (K*P) observation table
    that cost ~90 ms per mapping step on chip).

    obs_tbl (M, NOBS) flat observation indices; have (M, NOBS) validity;
    desc_flat (KP, 8) uint32. Returns (M, 8) uint32 (zeros where no obs).
    """
    from orb_slam_2_ros_tpu.ops.hamming import popcount_u32
    KP = desc_flat.shape[0]
    NOBS = obs_tbl.shape[1]
    desc_pad = jnp.concatenate(
        [desc_flat, jnp.zeros((1, 8), desc_flat.dtype)], axis=0)
    d = desc_pad[jnp.where(have, obs_tbl, KP)]             # (M, NOBS, 8)
    ham = jnp.sum(popcount_u32(d[:, :, None, :] ^ d[:, None, :, :]),
                  axis=-1)                                 # (M, NOBS, NOBS)
    big = jnp.int32(1 << 10)
    ham = jnp.where((have[:, :, None] & have[:, None, :]), ham, big)
    # median over each candidate's distances to the valid observations
    # (self-distance 0 included, matching the reference's vDists)
    sortd = jnp.sort(ham, axis=-1)
    nv = jnp.sum(have.astype(jnp.int32), axis=-1)          # (M,)
    med_idx = jnp.clip((nv - 1) // 2, 0, NOBS - 1)
    med = jnp.take_along_axis(sortd, med_idx[:, None, None],
                              axis=-1)[..., 0]             # (M, NOBS)
    med = jnp.where(have, med, big)
    best = jnp.argmin(med, axis=-1)                        # (M,)
    return jnp.take_along_axis(d, best[:, None, None],
                               axis=1)[:, 0]               # (M, 8)


def refresh_point_stats(state: MapState, cfg: SlamConfig) -> MapState:
    """Recompute viewing normals, scale-invariance bands, and representative
    descriptors for ALL map points in one pass over the observation table
    (``MapPoint::UpdateNormalAndDepth`` ``MapPoint.cc:388-452``,
    ``ComputeDistinctiveDescriptors`` ``MapPoint.cc:288-361``).

    Descriptor policy matches the reference: among a point's observations,
    keep the descriptor with minimum median Hamming distance to the others
    (``MapPoint.cc:288-361``), evaluated over the newest ``NOBS_DESC``
    observations per point (static cap; the reference uses all — newest-first
    keeps the selection tracking appearance drift). Between refreshes,
    ``commit_keyframe`` installs the newest observation incrementally.
    """
    K, P, M = state.K, state.P, state.M
    obs_mp = jnp.where(state.kf_valid[:, None], state.kf_mp, -1)   # (K, P)
    flat_mp = obs_mp.ravel()
    ok = flat_mp >= 0
    tgt = jnp.where(ok, flat_mp, M)

    centers = se3.camera_center(state.kf_q, state.kf_t)            # (K, 3)
    cen = jnp.repeat(centers, P, axis=0)                           # (K*P, 3)
    pos = state.mp_pos[jnp.clip(flat_mp, 0)]                       # (K*P, 3)
    d = pos - cen
    dist = jnp.linalg.norm(d, axis=-1)
    dirs = d / jnp.maximum(dist[:, None], 1e-9)

    nsum = jnp.zeros((M + 1, 3)).at[tgt].add(jnp.where(ok[:, None], dirs, 0.0))[:M]
    norm = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
    normal = nsum / jnp.maximum(norm, 1e-9)

    # scale band + descriptor from the newest observation
    kf_ids = jnp.repeat(jnp.arange(K, dtype=jnp.int32), P)
    newest = jnp.zeros((M + 1,), jnp.int32).at[tgt].max(
        jnp.where(ok, kf_ids + 1, 0))[:M] - 1                      # (M,) kf id or -1
    has_obs = newest >= 0
    oct_flat = state.kf_octave.ravel()
    is_newest = ok & (kf_ids == newest[jnp.clip(flat_mp, 0)])

    dist_new = jnp.zeros((M + 1,)).at[jnp.where(is_newest, flat_mp, M)].max(
        jnp.where(is_newest, dist, 0.0))[:M]
    oct_new = jnp.zeros((M + 1,), jnp.int32).at[jnp.where(is_newest, flat_mp, M)].max(
        jnp.where(is_newest, oct_flat, 0))[:M]
    sf = cfg.orb.scale_factor ** oct_new.astype(jnp.float32)
    max_d = dist_new * sf
    min_d = max_d / (cfg.orb.scale_factor ** (cfg.orb.n_levels - 1))
    desc_flat = state.kf_desc.reshape(-1, 8)
    # validate ring-buffer entries against the live observation table
    # (fusion/culling leave stale entries behind)
    tbl = state.mp_obs_tbl
    t_kf = jnp.clip(tbl // P, 0, K - 1)
    t_kp = jnp.clip(tbl % P, 0, P - 1)
    have = ((tbl >= 0) & state.kf_valid[t_kf]
            & (state.kf_mp[t_kf, t_kp] == jnp.arange(M)[:, None]))
    desc = _distinctive_descriptors(tbl, have, desc_flat)
    keep = state.mp_valid & has_obs
    # self-healing: when a point's whole ring buffer is stale/empty (map
    # built externally, loaded from disk, or heavily fused), fall back to
    # the newest observation's descriptor and re-seed the buffer with it
    flat_newest = jnp.zeros((M + 1,), jnp.int32).at[
        jnp.where(is_newest, flat_mp, M)].max(
        jnp.where(is_newest, jnp.arange(K * P, dtype=jnp.int32), 0))[:M]
    desc_newest = desc_flat[flat_newest]
    buffered = jnp.any(have, axis=-1)
    desc = jnp.where(buffered[:, None], desc, desc_newest)
    reseed = keep & ~buffered
    tbl = jnp.where(reseed[:, None],
                    jnp.full((M, NOBS_DESC), -1,
                             jnp.int32).at[:, 0].set(flat_newest), tbl)
    cnt = jnp.zeros((M + 1,), jnp.int32).at[tgt].add(ok.astype(jnp.int32))[:M]
    return state._replace(
        mp_normal=jnp.where(keep[:, None], normal, state.mp_normal),
        mp_max_dist=jnp.where(keep, 1.2 * max_d, state.mp_max_dist),
        mp_min_dist=jnp.where(keep, 0.8 * min_d, state.mp_min_dist),
        mp_desc=jnp.where(keep[:, None], desc, state.mp_desc),
        mp_obs_tbl=tbl,
        # rebuild the incremental pools so commit_keyframe stays consistent
        mp_dir_sum=jnp.where(keep[:, None], nsum, state.mp_dir_sum),
        mp_obs_cnt=jnp.where(state.mp_valid, cnt, state.mp_obs_cnt),
    )


def compact_points(state: MapState):
    """Re-pack valid map points to the front of the pool so culled/fused
    rows are reused by future spawns — the functional free-list
    (``Map::EraseMapPoint`` frees erased points, ``Map.cc:69-78``;
    SURVEY.md §7.0/§7.2 "capacity pools with free-lists + compaction").
    Without this, ``n_mps`` is a monotone allocator and a long sequence
    exhausts the pool even though culling keeps the live count bounded.

    Order-preserving permutation: live rows keep their relative order, so
    age (``mp_first_kf``) and ring-buffer semantics survive. Runs inside
    the jitted mapping step (pure gathers, ~1 ms at the 16k pool).

    Returns (state, remap (M,) int32: old id -> new id, -1 if culled).
    Callers holding map-point ids across the call (the tracker's
    ``last_mp``) must re-index through ``remap``.
    """
    M = state.M
    keep = state.mp_valid
    new_idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    remap = jnp.where(keep, new_idx, -1)
    tgt = jnp.where(keep, new_idx, M)
    inv = jnp.zeros((M + 1,), jnp.int32).at[tgt].set(
        jnp.arange(M, dtype=jnp.int32))[:M]
    n_valid = jnp.sum(keep.astype(jnp.int32))
    live = jnp.arange(M) < n_valid

    def g(pool, fill=0):
        out = pool[inv]
        mask = live.reshape((M,) + (1,) * (pool.ndim - 1))
        return jnp.where(mask, out, jnp.full_like(out, fill))

    kf_mp = jnp.where(state.kf_mp >= 0,
                      remap[jnp.clip(state.kf_mp, 0)], -1)
    state = state._replace(
        kf_mp=kf_mp,
        mp_pos=g(state.mp_pos),
        mp_valid=live,
        mp_desc=g(state.mp_desc),
        mp_normal=g(state.mp_normal),
        mp_min_dist=g(state.mp_min_dist),
        mp_max_dist=g(state.mp_max_dist, fill=1),
        mp_first_kf=g(state.mp_first_kf, fill=-1),
        mp_dir_sum=g(state.mp_dir_sum),
        mp_obs_cnt=g(state.mp_obs_cnt),
        mp_visible=g(state.mp_visible, fill=1),
        mp_found=g(state.mp_found, fill=1),
        mp_obs_tbl=g(state.mp_obs_tbl, fill=-1),
        n_mps=n_valid,
    )
    return state, remap


def compact_keyframes(state: MapState):
    """Re-pack valid keyframes to the front of the pool, freeing culled
    rows for reuse (``Map::EraseKeyFrame``, ``Map.cc:81-97``;
    ``KeyFrame::SetBadFlag`` re-parenting, ``KeyFrame.cc:553-671``).

    Order-preserving, so the insertion-order chain the loop closer uses as
    its spanning tree stays chronological. ``mp_first_kf`` entries whose
    keyframe was culled re-anchor to the nearest SURVIVING predecessor
    (the greedy re-parenting of ``SetBadFlag``); ring-buffer observation
    entries on culled keyframes are dropped (refresh re-seeds them).

    Returns (state, remap (K,) int32: old row -> new row, -1 if culled).
    Host-side consumers (FrameRecord.ref_kf, the loop closer's BoW index)
    must be re-based through ``remap`` — see ``System._compact_keyframes``.
    """
    K, P = state.K, state.P
    rows = jnp.arange(K)
    keep = state.kf_valid
    new_idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    remap = jnp.where(keep, new_idx, -1)
    tgt = jnp.where(keep, new_idx, K)
    inv = jnp.zeros((K + 1,), jnp.int32).at[tgt].set(
        rows.astype(jnp.int32))[:K]
    n_valid = jnp.sum(keep.astype(jnp.int32))
    live = rows < n_valid

    # nearest surviving predecessor of every old row (for re-anchoring)
    anc = jax.lax.associative_scan(jnp.maximum, jnp.where(keep, rows, -1))
    anchor_remap = jnp.where(anc >= 0, remap[jnp.clip(anc, 0)], 0)

    def g(pool, fill=0):
        out = pool[inv]
        mask = live.reshape((K,) + (1,) * (pool.ndim - 1))
        return jnp.where(mask, out, jnp.full_like(out, fill))

    first = jnp.clip(state.mp_first_kf, 0, K - 1)
    mp_first = jnp.where(state.mp_first_kf >= 0, anchor_remap[first], -1)
    # observation ring buffer: flat kf*P + kp indices follow their keyframe
    tbl = state.mp_obs_tbl
    t_kf = jnp.clip(tbl // P, 0, K - 1)
    tbl_new = jnp.where((tbl >= 0) & keep[t_kf],
                        remap[t_kf] * P + tbl % P, -1)
    state = state._replace(
        kf_q=g(state.kf_q),
        kf_t=g(state.kf_t),
        kf_valid=live,
        kf_frame_id=g(state.kf_frame_id, fill=-1),
        kf_uv=g(state.kf_uv),
        kf_ur=g(state.kf_ur, fill=-1),
        kf_depth=g(state.kf_depth, fill=-1),
        kf_octave=g(state.kf_octave),
        kf_angle=g(state.kf_angle),
        kf_desc=g(state.kf_desc),
        kf_kp_valid=g(state.kf_kp_valid),
        kf_mp=g(state.kf_mp, fill=-1),
        mp_first_kf=mp_first,
        mp_obs_tbl=tbl_new,
        n_kfs=n_valid,
    )
    return state, remap


def covisibility(state: MapState) -> jnp.ndarray:
    """(K, K) shared-observation counts — the covisibility graph
    (``KeyFrame::UpdateConnections``, ``KeyFrame.cc:344-460``) as one
    incidence matmul on the MXU."""
    K, M = state.K, state.M
    obs = jnp.where(state.kf_valid[:, None], state.kf_mp, -1)
    ok = obs >= 0
    tgt = jnp.where(ok, obs, M)
    inc = jnp.zeros((K, M + 1), jnp.float32)
    inc = inc.at[jnp.arange(K)[:, None], tgt].set(ok.astype(jnp.float32))
    inc = inc[:, :M] * state.mp_valid[None, :]
    cov = inc @ inc.T
    return (cov - jnp.diag(jnp.diag(cov))).astype(jnp.int32)


def commit_keyframe(state: MapState, frame: Frame, q, t, frame_id,
                    kp_to_mp: jnp.ndarray, need, cfg: SlamConfig,
                    close_only: bool = True, max_spawn: int = 512,
                    allow_far=None):
    """Branch-free (predicated) keyframe insertion + point spawning +
    incremental point-stat update, for use inside `lax.scan` loops.

    When ``need`` is False every write is redirected to dead slots / masked
    out and the counters do not advance, so the op is a data-flow no-op —
    this avoids `lax.cond`, whose untaken heavy branch still costs dozens of
    ms per scan step on TPU. Incremental stats replace the full
    refresh_point_stats rebuild: running direction sums give the mean viewing
    normal exactly, and the scale band/descriptor are refreshed from this
    (newest) observation, matching the refresh policy.

    Returns (state, kf_mp_row): the observation row of the (possibly
    uncommitted) keyframe; callers should use it only when ``need``.
    """
    cam = cfg.camera
    P = state.P
    M = state.M
    k = jnp.minimum(state.n_kfs, state.K - 1)
    needf = need.astype(jnp.float32)
    kp_mp = jnp.where(frame.kps.valid & need, kp_to_mp, -1)

    # --- write the keyframe row (row is reused by the next real insert if
    # this one is not committed; kf_valid gates all consumers)
    state = state._replace(
        kf_q=state.kf_q.at[k].set(q),
        kf_t=state.kf_t.at[k].set(t),
        kf_valid=state.kf_valid.at[k].set(
            need | (state.kf_valid[k] & (state.n_kfs > k))),
        kf_frame_id=state.kf_frame_id.at[k].set(frame_id),
        kf_uv=state.kf_uv.at[k].set(frame.uv),
        kf_ur=state.kf_ur.at[k].set(frame.u_right),
        kf_depth=state.kf_depth.at[k].set(frame.depth),
        kf_octave=state.kf_octave.at[k].set(frame.kps.octave),
        kf_angle=state.kf_angle.at[k].set(frame.kps.angle),
        kf_desc=state.kf_desc.at[k].set(frame.kps.desc),
        kf_kp_valid=state.kf_kp_valid.at[k].set(frame.kps.valid & need),
        kf_mp=state.kf_mp.at[k].set(kp_mp),
    )

    # --- incremental stats for points matched by this keyframe
    qi, ti = se3.inverse(q, t)
    ow = se3.camera_center(q, t)
    obs_mask = (kp_mp >= 0) & need
    mp_ids = jnp.where(obs_mask, kp_mp, M)          # overflow slot M
    pw = state.mp_pos[jnp.clip(kp_mp, 0)]
    d = pw - ow
    dist = jnp.linalg.norm(d, axis=-1)
    dirs = d / jnp.maximum(dist[:, None], 1e-9)
    sf = cfg.orb.scale_factor ** frame.kps.octave.astype(jnp.float32)
    max_d = dist * sf
    min_d = max_d / (cfg.orb.scale_factor ** (cfg.orb.n_levels - 1))

    def pad(pool):
        return jnp.concatenate([pool, jnp.zeros_like(pool[:1])], axis=0)

    dir_sum = pad(state.mp_dir_sum).at[mp_ids].add(
        jnp.where(obs_mask[:, None], dirs, 0.0))[:M]
    # ring-buffer slot from the PRE-increment count: newest NOBS_DESC
    # observations feed the representative-descriptor selection
    slot = state.mp_obs_cnt[jnp.clip(kp_mp, 0)] % NOBS_DESC
    flat_idx = k * P + jnp.arange(P, dtype=jnp.int32)
    obs_tbl = pad(state.mp_obs_tbl).at[mp_ids, slot].set(flat_idx)[:M]
    obs_cnt = pad(state.mp_obs_cnt).at[mp_ids].add(
        obs_mask.astype(jnp.int32))[:M]
    norm = jnp.linalg.norm(dir_sum, axis=-1, keepdims=True)
    state = state._replace(
        mp_dir_sum=dir_sum,
        mp_obs_cnt=obs_cnt,
        mp_obs_tbl=obs_tbl,
        mp_normal=jnp.where((obs_cnt > 0)[:, None],
                            dir_sum / jnp.maximum(norm, 1e-9),
                            state.mp_normal),
        mp_max_dist=pad(state.mp_max_dist).at[mp_ids].set(
            jnp.where(obs_mask, 1.2 * max_d, 0.0))[:M],
        mp_min_dist=pad(state.mp_min_dist).at[mp_ids].set(
            jnp.where(obs_mask, 0.8 * min_d, 0.0))[:M],
        mp_desc=pad(state.mp_desc).at[mp_ids].set(
            jnp.where(obs_mask[:, None], frame.kps.desc, 0))[:M],
    )

    # --- predicated spawning (close points, nearest-first static cap)
    depth = frame.depth
    eligible = frame.kps.valid & (depth > 0) & (kp_mp < 0) & need
    if close_only:
        th_close = cam.bf / cam.fx * cam.th_depth
        close = depth < th_close
        if allow_far is not None:
            # e.g. initialization spawns all depths (Tracking.cc:565-590)
            close = close | allow_far
        eligible = eligible & close
    if max_spawn >= P:
        # cap never binds: skip the depth argsort (a 1536-wide bitonic sort
        # cost ~1 ms of the 2.6 ms commit step on chip) — allocation order
        # is immaterial when everything eligible spawns
        ranks = jnp.cumsum(eligible.astype(jnp.int32)) - 1
        ranks = jnp.where(eligible, ranks, P)
    else:
        # nearest-first static cap (the reference's depth-sorted 100-point
        # top-up, Tracking.cc:1240-1296)
        rank_key = jnp.where(eligible, depth, jnp.inf)
        order = jnp.argsort(rank_key)
        ranks = jnp.zeros((P,), jnp.int32).at[order].set(
            jnp.arange(P, dtype=jnp.int32))
    capacity_left = M - state.n_mps
    spawn = eligible & (ranks < max_spawn) & (ranks < capacity_left)
    new_id = jnp.where(spawn, state.n_mps + ranks, -1)

    uv = frame.uv
    xy = (uv - jnp.array([cam.cx, cam.cy])) / jnp.array([cam.fx, cam.fy])
    xc = jnp.concatenate([xy * depth[:, None], depth[:, None]], axis=-1)
    xw = se3.apply(qi, ti, xc)
    tgt = jnp.where(spawn, new_id, M)
    dirs_s = xw - ow
    dist_s = jnp.linalg.norm(dirs_s, axis=-1)
    max_ds = dist_s * sf
    min_ds = max_ds / (cfg.orb.scale_factor ** (cfg.orb.n_levels - 1))

    def scat(pool, vals):
        return pad(pool).at[tgt].set(vals)[:-1]

    kf_mp_row = jnp.where(spawn, new_id, kp_mp)
    state = state._replace(
        mp_pos=scat(state.mp_pos, xw),
        mp_valid=scat(state.mp_valid, spawn),
        mp_desc=scat(state.mp_desc, frame.kps.desc),
        mp_normal=scat(state.mp_normal,
                       dirs_s / jnp.maximum(dist_s[:, None], 1e-9)),
        mp_min_dist=scat(state.mp_min_dist, 0.8 * min_ds),
        mp_max_dist=scat(state.mp_max_dist, 1.2 * max_ds),
        mp_first_kf=scat(state.mp_first_kf,
                         jnp.full((P,), 1, jnp.int32) * k),
        mp_dir_sum=scat(state.mp_dir_sum,
                        dirs_s / jnp.maximum(dist_s[:, None], 1e-9)),
        mp_obs_cnt=scat(state.mp_obs_cnt, jnp.ones((P,), jnp.int32)),
        mp_visible=scat(state.mp_visible, jnp.ones((P,), jnp.int32)),
        mp_found=scat(state.mp_found, jnp.ones((P,), jnp.int32)),
        mp_obs_tbl=scat(state.mp_obs_tbl,
                        jnp.full((P, NOBS_DESC), -1,
                                 jnp.int32).at[:, 0].set(flat_idx)),
        kf_mp=state.kf_mp.at[k].set(kf_mp_row),
        n_kfs=state.n_kfs + need.astype(jnp.int32),
        n_mps=state.n_mps + jnp.sum(spawn.astype(jnp.int32)),
    )
    return state, kf_mp_row
