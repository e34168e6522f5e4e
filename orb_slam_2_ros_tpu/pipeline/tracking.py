"""Tracking front end: per-frame pose estimation against the map.

Replaces ``Tracking.cc`` (1809 LoC state machine). The reference's flow —
GrabImage -> Frame -> TrackWithMotionModel -> TrackLocalMap ->
NeedNewKeyFrame -> CreateNewKeyFrame (``Tracking.cc:279-542``) — runs fully
on device: frames are processed in fixed-size CHUNKS with `lax.scan`;
initialization (``StereoInitialization``, ``Tracking.cc:545-630``), the
keyframe decision, and keyframe insertion are all PREDICATED dataflow
(masked writes, no `lax.cond`), so the whole run is one repeated XLA program
with zero host round trips.

Two properties of the remote-TPU relay shape this design (measured):
 - a host<->device fetch costs ~100 ms AND permanently drops the runtime
   into a ~30x slower per-launch mode — so the hot loop must not fetch;
   per-frame outputs are kept as device arrays and fetched once at the end
   (``flush()``), or eagerly for interactive use (``defer_fetch=False``).
 - an untaken `lax.cond` branch inside `lax.scan` still costs its full
   latency per step — hence predicated keyframe insertion
   (map/state.py commit_keyframe).

State machine states mirror ``Tracking.h:93-99``. Within a chunk a lost
frame keeps attempting motion-model tracking from the last good pose; at
chunk boundaries the System runs relocalization against the BoW index
(pipeline/relocalization.py ≙ ``Tracking.cc:1535``) and the loop-closing
step (pipeline/loop_closing.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import (SlamConfig, SENSOR_MONOCULAR,
                                       SENSOR_RGBD, SENSOR_STEREO)
from orb_slam_2_ros_tpu.frontend import frame as frame_mod
from orb_slam_2_ros_tpu.frontend import matcher
from orb_slam_2_ros_tpu.geometry import se3
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.solvers.pose_opt import pose_optimization

NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
LOST = 3


class TrackCarry(NamedTuple):
    """Device-resident tracking context carried across frames."""

    m: map_state.MapState
    initialized: jnp.ndarray   # () bool
    q: jnp.ndarray
    t: jnp.ndarray
    vel_q: jnp.ndarray
    vel_t: jnp.ndarray
    last_mp: jnp.ndarray       # (P,) kp -> mp of previous frame
    last_oct: jnp.ndarray
    last_angle: jnp.ndarray
    ref_tracked: jnp.ndarray   # () int32 inliers at last KF insertion
    since_kf: jnp.ndarray      # () int32
    frame_id: jnp.ndarray      # () int32
    since_reloc: jnp.ndarray   # () int32 frames since last relocalization:
                               # the local-map search widens to th=5 for two
                               # frames after a reloc (Tracking.cc:1327-1329)
    # localization-only VO: temporal points back-projected from the previous
    # frame's depth (UpdateLastFrame's "visual odometry" MapPoints,
    # ``Tracking.cc:893-968``) — all-zero/inert outside localization mode
    vo_pos: jnp.ndarray        # (P, 3) world positions
    vo_desc: jnp.ndarray       # (P, 8) uint32 descriptors
    vo_oct: jnp.ndarray        # (P,) int32
    vo_ok: jnp.ndarray         # (P,) bool
    # per-keypoint "matched a temporal VO point" flag of the last frame
    # (mvbVO, consumed by the FrameDrawer's blue points,
    # ``FrameDrawer.cc:133-139``); inert outside localization mode
    last_vo: jnp.ndarray       # (P,) bool


@dataclasses.dataclass
class FrameRecord:
    """Host-side per-frame observability record (SURVEY.md §5.5)."""

    frame_id: int
    timestamp: float
    state: int
    n_matches_frame: int
    n_inliers: int
    is_keyframe: bool
    R_wc: np.ndarray
    c_w: np.ndarray
    # inliers that are MAP points (excludes localization-VO temporal
    # points); n_map_inliers < 10 with state OK is the reference's mbVO
    # "odometry drifting, map lost from view" condition (Tracking.cc:385)
    n_map_inliers: int = 0
    # relative-pose bookkeeping (``Tracking.cc:524-540``): the frame's pose
    # expressed relative to its reference keyframe, so saved trajectories
    # reflect every later BA / loop-closure correction of that keyframe
    # (``System::SaveTrajectoryTUM``, ``System.cc:343-401``)
    ref_kf: int = -1
    q_cr: np.ndarray = None   # (4,) T_cr rotation (wxyz)
    t_cr: np.ndarray = None   # (3,) T_cr translation


def _quat_mul_np(a, b):
    """Hamilton product, (w, x, y, z) numpy quaternions."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw])


def _quat_rotate_np(q, v):
    t = 2.0 * np.cross(q[1:], v)
    return v + q[0] * t + np.cross(q[1:], t)


def _quat_to_R(qw, qx, qy, qz):
    return np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
    ])


@functools.lru_cache(maxsize=None)
def _compiled_track_chunk(cfg: SlamConfig):
    """Build + jit the per-chunk tracking program for a config (cached —
    SlamConfig is a frozen dataclass, so equal configs share one trace)."""
    P = cfg.orb.max_kps
    tc = cfg.tracking
    # close-point depth threshold mThDepth = bf * ThDepth / fx
    # (Tracking.cc:117-124)
    th_close = cfg.camera.bf / cfg.camera.fx * cfg.camera.th_depth

    def _track_core(m, frame, q_pred, t_pred, q_last, t_last,
                    last_mp, last_oct, last_angle,
                    vo_pos=None, vo_desc=None, vo_oct=None, vo_ok=None,
                    since_reloc=None):
        """Two-stage matching + pose LM (TrackWithMotionModel +
        TrackLocalMap, Tracking.cc:971-1093). In localization-only mode
        the vo_* arrays carry the previous frame's temporal
        visual-odometry points (UpdateLastFrame, ``Tracking.cc:893-968``)
        and join the pose edges so tracking survives leaving the mapped
        region (``Tracking.cc:349-418``)."""
        has_last = last_mp >= 0
        src_pos = m.mp_pos[jnp.clip(last_mp, 0)]
        src_desc = m.mp_desc[jnp.clip(last_mp, 0)]
        src_ok = has_last & m.mp_valid[jnp.clip(last_mp, 0)]
        kp_to_src, _ = matcher.search_by_projection_pose(
            src_pos, src_desc, last_oct, src_ok, q_pred, t_pred, frame,
            cfg, th=15.0, src_angle=last_angle, check_rotation=True,
            widen_below=tc.min_matches_motion)
        kp_mp1 = jnp.where(kp_to_src >= 0,
                           last_mp[jnp.clip(kp_to_src, 0)], -1)

        # TrackReferenceKeyFrame fallback (Tracking.cc:328-339, :839-868):
        # when motion-model matching stays short even after the widened
        # window, re-associate against the newest keyframe's map points
        # by descriptor (matcher.search_reference_kf) and optimize from
        # the LAST pose instead of the constant-velocity prediction.
        # Predicated dataflow: both branches computed, one selected.
        r = jnp.maximum(m.n_kfs - 1, 0)
        ref_mp = m.kf_mp[r]
        ref_ok = (m.kf_kp_valid[r] & (ref_mp >= 0)
                  & m.mp_valid[jnp.clip(ref_mp, 0)] & (m.n_kfs > 0))
        kp_to_ref, _ = matcher.search_reference_kf(
            m.kf_desc[r], ref_ok, m.kf_angle[r], frame, cfg)
        kp_mp_ref = jnp.where(kp_to_ref >= 0,
                              ref_mp[jnp.clip(kp_to_ref, 0)], -1)
        n_mot = jnp.sum((kp_mp1 >= 0).astype(jnp.int32))
        n_ref = jnp.sum((kp_mp_ref >= 0).astype(jnp.int32))
        use_ref = ((n_mot < tc.min_matches_motion)
                   & (n_ref >= tc.min_matches_reference)
                   & (n_ref > n_mot))
        kp_mp1 = jnp.where(use_ref, kp_mp_ref, kp_mp1)
        q_start = jnp.where(use_ref, q_last, q_pred)
        t_start = jnp.where(use_ref, t_last, t_pred)

        # localization-VO: match unassociated keypoints against the
        # previous frame's temporal points so the pose stays estimable
        # with the map out of view (static branch — zero cost outside
        # localization mode)
        use_vo = cfg.localization_only and vo_pos is not None
        if use_vo:
            # vo arrays are indexed by the previous frame's keypoint
            # slots, the same layout as last_angle
            kp_to_vo, _ = matcher.search_by_projection_pose(
                vo_pos, vo_desc, vo_oct, vo_ok, q_pred, t_pred, frame,
                cfg, th=15.0, src_angle=last_angle, check_rotation=True,
                widen_below=tc.min_matches_motion)
            kp_vo = jnp.where(kp_mp1 >= 0, -1, kp_to_vo)
            pos1 = jnp.where((kp_mp1 >= 0)[:, None],
                             m.mp_pos[jnp.clip(kp_mp1, 0)],
                             vo_pos[jnp.clip(kp_vo, 0)])
            valid1 = (kp_mp1 >= 0) | (kp_vo >= 0)
        else:
            kp_vo = jnp.full_like(kp_mp1, -1)
            pos1 = m.mp_pos[jnp.clip(kp_mp1, 0)]
            valid1 = kp_mp1 >= 0

        q1, t1, inl1, n1 = pose_optimization(
            q_start, t_start, pos1, frame.uv,
            frame.u_right, frame.kps.octave, valid1, cfg)
        kp_mp1 = jnp.where(inl1, kp_mp1, -1)
        kp_vo = jnp.where(inl1, kp_vo, -1)

        tv = matcher.frustum_check(
            q1, t1, m.mp_pos, m.mp_normal, m.mp_min_dist, m.mp_max_dist,
            m.mp_valid, cfg)
        # visibility bookkeeping: frustum-passing points plus points
        # already matched by the motion-model stage count as "visible"
        # this frame (IncreaseVisible call sites, Tracking.cc:1330-1352)
        seen1 = jnp.zeros((m.M + 1,), bool).at[
            jnp.where(kp_mp1 >= 0, kp_mp1, m.M)].set(True)[:m.M]
        vis_mask = tv.ok | seen1
        # compact frustum survivors into a bounded candidate set (the
        # array analog of the reference's 80-keyframe local map,
        # Tracking.cc:1409-1532): the matcher's per-pair gates run on
        # the VPU, so sweeping only live candidates instead of the full
        # point pool is a direct per-frame win
        CAND = min(cfg.map.local_map_cap, m.M)
        M_ = m.M
        rank = jnp.cumsum(tv.ok.astype(jnp.int32)) - 1
        slot = jnp.where(tv.ok & (rank < CAND), rank, CAND)
        cand = jnp.zeros((CAND + 1,), jnp.int32).at[slot].set(
            jnp.arange(M_, dtype=jnp.int32))[:CAND]
        cand_ok = jnp.arange(CAND) < jnp.sum(tv.ok.astype(jnp.int32))
        tv_c = matcher.TrackInView(
            uv=tv.uv[cand], u_right=tv.u_right[cand],
            dist=tv.dist[cand], view_cos=tv.view_cos[cand],
            pred_level=tv.pred_level[cand], ok=cand_ok)
        # search window: th=3 for RGB-D, 1 otherwise; widened to 5 for
        # two frames after a relocalization (SearchLocalPoints,
        # Tracking.cc:1322-1330)
        th_base = 3.0 if cfg.sensor == SENSOR_RGBD else 1.0
        th_lm = jnp.float32(th_base)
        if since_reloc is not None:
            th_lm = jnp.where(since_reloc < 2, jnp.float32(5.0), th_lm)
        kp_to_c, _ = matcher.search_local_map(
            tv_c, m.mp_desc[cand], frame, kp_mp1 >= 0, cfg, th=th_lm)
        kp_to_mp2 = jnp.where(kp_to_c >= 0,
                              cand[jnp.clip(kp_to_c, 0)], -1)
        kp_mp = jnp.where(kp_mp1 >= 0, kp_mp1, kp_to_mp2)
        if use_vo:   # a local-map match supersedes a temporal VO match
            kp_vo = jnp.where(kp_mp >= 0, -1, kp_vo)
            pos2 = jnp.where((kp_mp >= 0)[:, None],
                             m.mp_pos[jnp.clip(kp_mp, 0)],
                             vo_pos[jnp.clip(kp_vo, 0)])
            valid2 = (kp_mp >= 0) | (kp_vo >= 0)
        else:
            pos2 = m.mp_pos[jnp.clip(kp_mp, 0)]
            valid2 = kp_mp >= 0
        q2, t2, inl2, n2 = pose_optimization(
            q1, t1, pos2, frame.uv, frame.u_right,
            frame.kps.octave, valid2, cfg)
        n_map = jnp.sum((inl2 & (kp_mp >= 0)).astype(jnp.int32))
        kp_mp = jnp.where(inl2, kp_mp, -1)
        close = frame.valid & (frame.depth > 0) & (frame.depth < th_close)
        n_close_tr = jnp.sum((close & (kp_mp >= 0)).astype(jnp.int32))
        n_close_free = jnp.sum((close & (kp_mp < 0)).astype(jnp.int32))
        return (q2, t2, kp_mp, n1, n2, n_map, n_close_tr, n_close_free,
                vis_mask, kp_vo >= 0)

    def _build_frame(gray_u8, aux_w):
        # inputs arrive in wire format (u8 gray, u16 millimetre depth or
        # u8 right image) and convert on device: host->device bandwidth
        # is the measured bottleneck of the whole pipeline, and u8/u16
        # carry the same information the reference's 8-bit images and
        # TUM 16-bit depth PNGs do
        gray = gray_u8.astype(jnp.float32)
        # static sensor branch: for stereo `aux` is the right image
        # (Frame.cc:62-118), for RGB-D the metric depth map (:679-701),
        # for mono it is ignored
        if cfg.sensor == SENSOR_STEREO:
            return frame_mod.build_stereo(gray, aux_w.astype(jnp.float32),
                                          cfg)
        elif cfg.sensor == SENSOR_MONOCULAR:
            return frame_mod.build_mono(gray, cfg)
        depth = aux_w.astype(jnp.float32) * jnp.float32(1e-3)
        return frame_mod.build_rgbd(gray, depth, cfg)

    def _frame_step(carry: TrackCarry, inputs):
        frame, active = inputs
        m = carry.m

        # ---------- tracking attempt (garbage but harmless pre-init)
        q_pred, t_pred = se3.compose(carry.vel_q, carry.vel_t,
                                     carry.q, carry.t)
        (q2, t2, kp_mp, n1, n2, n_map, nct, ncf, vis_mask,
         kp_is_vo) = _track_core(
            m, frame, q_pred, t_pred, carry.q, carry.t,
            carry.last_mp, carry.last_oct, carry.last_angle,
            carry.vo_pos, carry.vo_desc, carry.vo_oct, carry.vo_ok,
            carry.since_reloc)
        good = ((n2 >= tc.min_inliers_local_map) & active
                & carry.initialized)
        # found/visible counters (MapPoint.cc:268-283): feed the
        # found-ratio map-point culling (LocalMapping.cc:221)
        m = map_state.bump_visibility(m, vis_mask, kp_mp,
                                      active & carry.initialized)

        # ---------- stereo/RGB-D initialization (predicated); mono
        # initializes at the System level (two-view reconstruction)
        n_depth = jnp.sum((frame.valid & (frame.depth > 0)).astype(jnp.int32))
        can_init = ((~carry.initialized) & active
                    & (n_depth >= tc.min_init_stereo_kps))
        if cfg.sensor == SENSOR_MONOCULAR:
            can_init = jnp.array(False)
        q_init = se3.quat_exp(jnp.array([cfg.initial_pitch, 0.0, 0.0]))
        t_init = jnp.zeros(3)

        # ---------- keyframe decision (NeedNewKeyFrame, Tracking.cc:1103)
        capacity_ok = ((m.M - m.n_mps >= 1024) & (m.n_kfs < m.K))
        need_close = (nct < 100) & (ncf > 70)
        c1 = carry.since_kf >= tc.max_frames_between_kf
        c2 = ((n2 < (0.75 * carry.ref_tracked.astype(jnp.float32)))
              | need_close)
        need_kf = good & capacity_ok & (n2 > 15) & (c1 | c2)
        if cfg.localization_only:
            # localization mode: map frozen (System.cc:578-605)
            need_kf = jnp.array(False)
            can_init = jnp.array(False)

        # ---------- predicated commit (insert + spawn, no lax.cond)
        commit = need_kf | (can_init & capacity_ok)
        q_c = jnp.where(can_init, q_init, q2)
        t_c = jnp.where(can_init, t_init, t2)
        kp_mp_c = jnp.where(can_init, -jnp.ones_like(kp_mp), kp_mp)
        m, kf_row = map_state.commit_keyframe(
            m, frame, q_c, t_c, carry.frame_id, kp_mp_c, commit, cfg,
            close_only=True, max_spawn=P, allow_far=can_init)
        kp_mp_out = jnp.where(commit, kf_row, kp_mp)
        n_spawned = jnp.sum((kf_row >= 0).astype(jnp.int32))

        # ---------- carry updates
        track_ok = good | can_init
        q_new = jnp.where(can_init, q_init, jnp.where(good, q2, carry.q))
        t_new = jnp.where(can_init, t_init, jnp.where(good, t2, carry.t))
        vq, vt = se3.relative(q2, t2, carry.q, carry.t)
        vel_q = jnp.where(good, vq, jnp.where(
            can_init, jnp.array([1.0, 0, 0, 0]), carry.vel_q))
        vel_t = jnp.where(good, vt, jnp.where(
            can_init, jnp.zeros(3), carry.vel_t))
        initialized = carry.initialized | can_init

        # localization-VO: re-spawn temporal points from THIS frame's
        # close depths under its final pose for the next frame's match
        # (UpdateLastFrame, Tracking.cc:919-965; static branch)
        if cfg.localization_only and cfg.sensor != SENSOR_MONOCULAR:
            from orb_slam_2_ros_tpu.geometry import camera as cam_mod
            xc = cam_mod.backproject(cfg.camera, frame.uv, frame.depth)
            qi_w, ti_w = se3.inverse(q_new, t_new)
            vo_pos_new = se3.apply(qi_w, ti_w, xc)
            vo_ok_new = (frame.valid & (frame.depth > 0)
                         & (frame.depth < th_close) & track_ok)
            vo_pos_c = jnp.where(track_ok, vo_pos_new, carry.vo_pos)
            vo_desc_c = jnp.where(track_ok, frame.desc, carry.vo_desc)
            vo_oct_c = jnp.where(track_ok, frame.kps.octave, carry.vo_oct)
            vo_ok_c = jnp.where(track_ok, vo_ok_new, carry.vo_ok)
        else:
            vo_pos_c, vo_desc_c = carry.vo_pos, carry.vo_desc
            vo_oct_c, vo_ok_c = carry.vo_oct, carry.vo_ok

        new_carry = TrackCarry(
            m=m, initialized=initialized, q=q_new, t=t_new,
            vel_q=vel_q, vel_t=vel_t,
            last_mp=jnp.where(track_ok, kp_mp_out, carry.last_mp),
            last_oct=jnp.where(track_ok, frame.kps.octave, carry.last_oct),
            last_angle=jnp.where(track_ok, frame.kps.angle,
                                 carry.last_angle),
            vo_pos=vo_pos_c, vo_desc=vo_desc_c, vo_oct=vo_oct_c,
            vo_ok=vo_ok_c,
            last_vo=jnp.where(track_ok, kp_is_vo, carry.last_vo),
            ref_tracked=jnp.where(can_init, n_spawned,
                                  jnp.where(need_kf, n2,
                                            carry.ref_tracked)),
            since_kf=jnp.where(commit, 0,
                               carry.since_kf + active.astype(jnp.int32)),
            frame_id=carry.frame_id + active.astype(jnp.int32),
            since_reloc=jnp.minimum(
                carry.since_reloc + active.astype(jnp.int32), 1000))

        state_code = jnp.where(
            track_ok, OK,
            jnp.where(initialized, LOST, NOT_INITIALIZED))
        qi, ti = se3.inverse(q_new, t_new)
        n1_out = jnp.where(can_init, n_spawned, n1)
        n2_out = jnp.where(can_init, n_spawned, n2)
        # reference-keyframe relative pose T_cr = T_cw * T_rw^-1
        # (Tracking.cc:524-540): composed with the keyframe's CURRENT
        # pose at save time so trajectories follow BA/loop corrections
        r_ref = m.n_kfs - 1
        rr = jnp.clip(r_ref, 0)
        q_cr, t_cr = se3.relative(q_new, t_new, m.kf_q[rr], m.kf_t[rr])
        out = jnp.concatenate([
            jnp.stack([n1_out.astype(jnp.float32),
                       n2_out.astype(jnp.float32),
                       commit.astype(jnp.float32),
                       state_code.astype(jnp.float32)]),
            qi, ti, r_ref.astype(jnp.float32)[None], q_cr, t_cr,
            n_map.astype(jnp.float32)[None]])
        return new_carry, out

    @jax.jit
    def _track_chunk(carry: TrackCarry, grays, depths, active):
        # frame building stays INSIDE the scan: although extraction has
        # no sequential dependency, vmapping it across the chunk was
        # measured SLOWER (248 -> 200 fps) — 16 in-flight image pyramids
        # thrash HBM, while one-frame-at-a-time keeps the working set
        # resident and lets XLA overlap extraction with the previous
        # frame's tracking tail
        def step(c, inputs):
            gray_u8, aux_w, act = inputs
            return _frame_step(c, (_build_frame(gray_u8, aux_w), act))
        return jax.lax.scan(step, carry, (grays, depths, active))

    return _track_chunk


class Tracker:
    """Per-frame tracking pipeline for all three sensors. Stereo/RGB-D
    initialization is predicated dataflow inside the scan; monocular
    initialization happens at the System level (pipeline/mono_init.py)
    before scan tracking starts, mirroring the reference's split
    (``MonocularInitialization``, ``Tracking.cc:633-816``)."""

    CHUNK = 16   # fixed scan length: every chunk call hits the same program

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        # mono spawns landmarks only via between-keyframe triangulation,
        # which runs at chunk boundaries — a finer chunk keeps the map
        # growing fast enough for its quicker point turnover
        self.chunk = 8 if cfg.sensor == SENSOR_MONOCULAR else self.CHUNK
        self.state = NO_IMAGES_YET
        self.records: List[FrameRecord] = []
        self._pending = []          # [(timestamps, device outs)]
        self._active_full = None    # cached on-device all-active mask
        self._last_outs = None      # (outs, k) of the most recent chunk
        self.carry = self._fresh_carry(map_state.empty(cfg))
        # one compiled program per CONFIG, not per Tracker: the chunk
        # program's trace alone costs tens of seconds, and benchmarks /
        # multi-session tools build several trackers over the same config
        self._track_chunk = _compiled_track_chunk(cfg)


    def _fresh_carry(self, m: map_state.MapState,
                     initialized: bool = False) -> TrackCarry:
        P = self.cfg.orb.max_kps
        return TrackCarry(
            m=m, initialized=jnp.array(initialized),
            q=jnp.array([1.0, 0, 0, 0]), t=jnp.zeros(3),
            vel_q=jnp.array([1.0, 0, 0, 0]), vel_t=jnp.zeros(3),
            last_mp=jnp.full((P,), -1, jnp.int32),
            last_oct=jnp.zeros((P,), jnp.int32),
            last_angle=jnp.zeros((P,), jnp.float32),
            ref_tracked=jnp.int32(0), since_kf=jnp.int32(0),
            frame_id=jnp.int32(0), since_reloc=jnp.int32(1000),
            vo_pos=jnp.zeros((P, 3), jnp.float32),
            vo_desc=jnp.zeros((P, 8), jnp.uint32),
            vo_oct=jnp.zeros((P,), jnp.int32),
            vo_ok=jnp.zeros((P,), bool),
            last_vo=jnp.zeros((P,), bool))

    # ------------------------------------------------------------- host API

    @property
    def map(self):
        return self.carry.m

    @property
    def n_kfs(self):
        return int(jax.device_get(self.carry.m.n_kfs))

    def to_wire(self, grays, auxs):
        """Convert float images to the wire format the device program
        consumes: u8 gray; u16 millimetre depth (RGB-D) or u8 right image
        (stereo). 2.7x less host->device traffic than float32 with the
        information content of the reference's 8-bit images / 16-bit TUM
        depth PNGs."""
        grays8 = np.clip(np.round(np.asarray(grays, np.float32)),
                         0, 255).astype(np.uint8)
        if self.cfg.sensor == SENSOR_STEREO:
            aux_w = np.clip(np.round(np.asarray(auxs, np.float32)),
                            0, 255).astype(np.uint8)
        else:
            aux_w = np.clip(np.round(np.asarray(auxs, np.float32) * 1e3),
                            0, 65535).astype(np.uint16)
        return grays8, aux_w

    def process_chunk(self, grays: np.ndarray, depths: np.ndarray,
                      timestamps, defer_fetch: bool = False,
                      prestaged: bool = False):
        """Process a batch of frames on device. grays/depths: (N, H, W)
        float images, or wire-format device arrays when ``prestaged``
        (see ``to_wire``; the bench pre-stages to overlap transfers).

        With defer_fetch=True nothing is copied back (keeps the relay in its
        fast-launch mode); call flush() at the end of the run to materialize
        FrameRecords. Otherwise records are fetched and returned now.
        """
        if not prestaged:
            grays, depths = self.to_wire(grays, depths)
        n = grays.shape[0]
        C = self.chunk
        if self._active_full is None:
            # cache the all-active mask on device: a fresh host array per
            # chunk costs a fixed-latency transfer through the relay
            self._active_full = jax.device_put(np.ones((C,), bool))
        for w0 in range(0, n, C):
            w1 = min(w0 + C, n)
            k = w1 - w0
            g = grays[w0:w1]
            d = depths[w0:w1]
            if k < C:   # pad to the fixed chunk length; padded frames inert
                g = jnp.concatenate([g] + [g[-1:]] * (C - k), axis=0)
                d = jnp.concatenate([d] + [d[-1:]] * (C - k), axis=0)
                active = np.arange(C) < k
            else:
                active = self._active_full
            self.carry, outs = self._track_chunk(self.carry, g, d, active)
            self._pending.append((list(timestamps[w0:w1]), outs, k))
            self._last_outs = (outs, k)
        if defer_fetch:
            return []
        return self.flush()

    def process(self, gray: np.ndarray, depth: np.ndarray,
                timestamp: float) -> FrameRecord:
        """Single-frame convenience wrapper (one padded chunk)."""
        return self.process_chunk(gray[None], depth[None], [timestamp])[0]

    def last_chunk_states(self):
        """Per-frame state codes of the most recent chunk (np int array) or
        None — the System's per-chunk probe for the reference's
        track-then-relocalize-next-frame semantics (``Tracking.cc:341-346``):
        LOST frames trigger relocalization attempts and a host-level chunk
        replay instead of waiting for the sequence end. One small
        synchronous fetch (C floats)."""
        if self._last_outs is None:
            return None
        outs, k = self._last_outs
        return np.asarray(jax.device_get(outs[:, 3]))[:k].astype(int)

    def pop_pending(self):
        """Discard the most recent chunk's deferred records (the System's
        relocalization replay re-tracks that chunk)."""
        if self._pending:
            self._pending.pop()
        self._last_outs = None

    def flush(self) -> List[FrameRecord]:
        """Materialize all pending per-frame records (one device fetch)."""
        if not self._pending:
            return []
        fetched = jax.device_get([p[1] for p in self._pending])
        recs = []
        for (ts, _, k), outs in zip(self._pending, fetched):
            outs = np.asarray(outs)[:k]
            for j, row in enumerate(outs):
                n1, n2, is_kf, state_f = row[:4]
                qw, qx, qy, qz = row[4:8]
                state = int(state_f)
                rec = FrameRecord(
                    frame_id=len(self.records), timestamp=ts[j],
                    state=state, n_matches_frame=int(n1), n_inliers=int(n2),
                    is_keyframe=bool(is_kf > 0),
                    R_wc=_quat_to_R(qw, qx, qy, qz), c_w=np.array(row[8:11]),
                    ref_kf=int(row[11]), q_cr=np.array(row[12:16]),
                    t_cr=np.array(row[16:19]),
                    n_map_inliers=int(row[19]) if len(row) > 19 else int(n2))
                self.records.append(rec)
                recs.append(rec)
        self._pending = []
        if recs:
            self.state = recs[-1].state
        return recs

    def attach_map(self, m: map_state.MapState):
        """Adopt a loaded map and start tracking against it from the origin
        (``System::LoadMap`` semantics: the tracker re-acquires by local-map
        search or explicit relocalization)."""
        self.carry = self._fresh_carry(m, initialized=True)
        self.state = OK

    def adopt_map(self, m: map_state.MapState):
        """Swap in an externally updated map (local BA / loop correction),
        keeping the tracking context."""
        self.carry = self.carry._replace(m=m)

    def force_pose(self, q, t, kp_mp, octave, angle):
        """Adopt a relocalized pose + associations (``Tracking.cc:1714-1719``:
        after successful relocalization the tracker resumes from the new
        pose with a cleared motion model)."""
        self.carry = self.carry._replace(
            q=q, t=t, vel_q=jnp.array([1.0, 0, 0, 0]), vel_t=jnp.zeros(3),
            last_mp=kp_mp, last_oct=octave, last_angle=angle,
            initialized=jnp.array(True),
            # widen the local-map search for the next 2 frames
            # (Tracking.cc:1327-1329, mnLastRelocFrameId)
            since_reloc=jnp.int32(0),
            # drop temporal VO points: their world positions were anchored
            # to the pre-relocalization (drifted) pose
            vo_ok=jnp.zeros_like(self.carry.vo_ok),
            last_vo=jnp.zeros_like(self.carry.last_vo))
        self.state = OK

    # ------------------------------------------------------------ trajectory

    def trajectory_wc(self):
        return [(r.R_wc, r.c_w) for r in self.records], \
               [r.timestamp for r in self.records]

    def composed_trajectory(self, skip_lost: bool = True):
        """Per-frame camera-to-world poses composed through each frame's
        reference keyframe: ``T_cw = T_cr * T_rw(current)`` — so the output
        reflects every local-BA / loop-closure / global-BA correction applied
        to the keyframes since the frame was tracked
        (``System::SaveTrajectoryTUM``, ``System.cc:343-401``; lost frames
        skipped like the reference's ``mbLost`` gate when ``skip_lost``).

        Returns (poses [(R_wc, c_w)], timestamps)."""
        m = self.carry.m
        kf_q = np.asarray(jax.device_get(m.kf_q))
        kf_t = np.asarray(jax.device_get(m.kf_t))
        poses, ts = [], []
        for r in self.records:
            if r.ref_kf is None or r.ref_kf < 0 or r.q_cr is None:
                continue
            if skip_lost and r.state != OK:
                continue
            q_cw = _quat_mul_np(r.q_cr, kf_q[r.ref_kf])
            t_cw = _quat_rotate_np(r.q_cr, kf_t[r.ref_kf]) + r.t_cr
            R_cw = _quat_to_R(*q_cw)
            poses.append((R_cw.T, -R_cw.T @ t_cw))
            ts.append(r.timestamp)
        return poses, ts
