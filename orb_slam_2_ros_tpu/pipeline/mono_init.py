"""Monocular bootstrap: two-view initialization + initial map construction.

Replaces ``Tracking::MonocularInitialization`` + ``CreateInitialMapMonocular``
(SURVEY.md §2.2, ``Tracking.cc:633-816``): hold a reference frame, match new
frames against it in a window (``SearchForInitialization``), run the vmapped
H/F RANSAC initializer, and on success build the two-keyframe map —
triangulated landmarks observed in both keyframes, a 20-iteration global BA
(``Tracking.cc:765``), and median-scene-depth normalization to unit scale
(``:775-800``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.frontend import frame as frame_mod
from orb_slam_2_ros_tpu.frontend import matcher
from orb_slam_2_ros_tpu.frontend.frame import Frame
from orb_slam_2_ros_tpu.geometry import camera, se3
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.solvers import ba, initializer


class MonoInitializer:
    """Host state machine over two jitted programs: try-init and build-map."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.ref: Optional[Frame] = None
        self.ref_frame_id = -1
        # last attempt's (current keypoint -> reference keypoint) matches,
        # kept for the FrameDrawer's initialization match lines
        # (``FrameDrawer.cc:92-105``); device array or None
        self.last_matches = None
        self._key = jax.random.PRNGKey(cfg.seed + 2)

        @jax.jit
        def _try_init(ref: Frame, cur: Frame, key: jax.Array):
            cur_to_ref, _ = matcher.search_for_initialization(ref, cur, cfg)
            pair = cur_to_ref >= 0
            n_matches = jnp.sum(pair.astype(jnp.int32))
            ridx = jnp.clip(cur_to_ref, 0)
            K = camera.intrinsics(cfg.camera)
            res = initializer.initialize(ref.uv[ridx], cur.uv, pair, K, key)
            ok = (res.ok & (n_matches >= cfg.tracking.min_init_mono_matches))
            return ok, res, cur_to_ref, n_matches

        @jax.jit
        def _build_map(ref: Frame, cur: Frame, cur_to_ref, q, t, points,
                       good, ref_frame_id, cur_frame_id):
            """Initial map: KF0 at identity, KF1 at (q, t); landmarks =
            accepted triangulations, observed in both keyframes; global BA;
            unit-median-depth scale normalization."""
            P = cur.uv.shape[0]
            m = map_state.empty(cfg)
            m, _ = map_state.insert_keyframe(
                m, ref, *se3.identity(), ref_frame_id,
                jnp.full((P,), -1, jnp.int32))
            m, _ = map_state.insert_keyframe(
                m, cur, q, t, cur_frame_id, jnp.full((P,), -1, jnp.int32))

            # spawn landmarks (aligned on cur's keypoint axis)
            spawn = good & (cur_to_ref >= 0) & cur.valid
            rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
            new_id = jnp.where(spawn, rank, -1)
            tgt = jnp.where(spawn, new_id, m.M)
            ridx = jnp.clip(cur_to_ref, 0)

            c1 = se3.camera_center(q, t)
            d0 = jnp.linalg.norm(points, axis=-1)
            d1 = jnp.linalg.norm(points - c1, axis=-1)
            dirs = points / jnp.maximum(d0[:, None], 1e-9) \
                + (points - c1) / jnp.maximum(d1[:, None], 1e-9)
            nrm = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
            sf = cfg.orb.scale_factor ** cur.kps.octave.astype(jnp.float32)
            max_d = d1 * sf
            min_d = max_d / (cfg.orb.scale_factor ** (cfg.orb.n_levels - 1))

            def pad(pool):
                return jnp.concatenate([pool, jnp.zeros_like(pool[:1])], 0)

            m = m._replace(
                mp_pos=pad(m.mp_pos).at[tgt].set(points)[:m.M],
                mp_valid=pad(m.mp_valid).at[tgt].set(spawn)[:m.M],
                mp_desc=pad(m.mp_desc).at[tgt].set(cur.kps.desc)[:m.M],
                mp_normal=pad(m.mp_normal).at[tgt].set(nrm)[:m.M],
                mp_min_dist=pad(m.mp_min_dist).at[tgt].set(0.8 * min_d)[:m.M],
                mp_max_dist=pad(m.mp_max_dist).at[tgt].set(1.2 * max_d)[:m.M],
                mp_first_kf=pad(m.mp_first_kf).at[tgt].set(
                    jnp.zeros((P,), jnp.int32))[:m.M],
                mp_dir_sum=pad(m.mp_dir_sum).at[tgt].set(dirs)[:m.M],
                mp_obs_cnt=pad(m.mp_obs_cnt).at[tgt].set(
                    jnp.full((P,), 2, jnp.int32))[:m.M],
                mp_visible=pad(m.mp_visible).at[tgt].set(
                    jnp.ones((P,), jnp.int32))[:m.M],
                mp_found=pad(m.mp_found).at[tgt].set(
                    jnp.ones((P,), jnp.int32))[:m.M],
                kf_mp=m.kf_mp
                .at[0, jnp.where(spawn, ridx, P)].set(
                    jnp.where(spawn, new_id, -1), mode="drop")
                .at[1, jnp.where(spawn, jnp.arange(P), P)].set(
                    jnp.where(spawn, new_id, -1), mode="drop"),
                n_mps=jnp.sum(spawn.astype(jnp.int32)))

            # structure-only refinement of the 2-view problem. The reference
            # runs a full GBA here (Tracking.cc:765), but with both-camera
            # freedom the monocular scale gauge is unconstrained and an
            # accept-if-lower LM slides along it (measured: diverges within
            # ~10 iterations at ~1 deg parallax); the initializer's
            # Sampson-refined pose is already at the noise floor, so only
            # the landmarks are polished (documented deviation)
            kp_valid = m.kf_kp_valid & m.kf_valid[:, None]
            prob = ba.build_problem(m.kf_uv, m.kf_ur, m.kf_octave, m.kf_mp,
                                    kp_valid, cfg)
            cam_free = jnp.zeros((m.K,), bool)
            qb, tb, pos, _ = ba.bundle_adjustment(
                m.kf_q, m.kf_t, cam_free, m.mp_pos, m.mp_valid, prob, cfg,
                phases=(20,))
            m = m._replace(kf_q=qb, kf_t=tb, mp_pos=pos)

            # median-depth scale normalization (Tracking.cc:775-800)
            z0 = se3.apply(m.kf_q[0], m.kf_t[0], m.mp_pos)[:, 2]
            med = jnp.median(jnp.where(m.mp_valid, z0, jnp.nan))
            inv_med = 1.0 / jnp.maximum(jnp.nan_to_num(med, nan=1.0), 1e-6)
            m = m._replace(
                mp_pos=m.mp_pos * inv_med,
                kf_t=m.kf_t * inv_med,
                mp_min_dist=m.mp_min_dist * inv_med,
                mp_max_dist=m.mp_max_dist * inv_med)
            m = map_state.refresh_point_stats(m, cfg)
            # tracker bootstrap: cur-frame keypoint -> map point row
            kp_mp1 = m.kf_mp[1]
            return m, m.kf_q[1], m.kf_t[1], kp_mp1

        self._try_init = _try_init
        self._build_map = _build_map

    def process(self, gray, frame_id: int):
        """Feed one frame. Returns None while initializing, else
        (map, q1, t1, kp_mp, cur_frame) ready for the tracker."""
        frame = frame_mod.build_mono(jnp.asarray(gray, jnp.float32), self.cfg)
        n_kps = int(jax.device_get(jnp.sum(frame.valid.astype(jnp.int32))))
        if self.ref is None or n_kps <= 100:
            # (re)set reference (Tracking.cc:638-660)
            self.ref = frame if n_kps > 100 else None
            self.ref_frame_id = frame_id if n_kps > 100 else -1
            return None
        self._key, sub = jax.random.split(self._key)
        ok, res, cur_to_ref, n_matches = self._try_init(self.ref, frame, sub)
        self.last_matches = cur_to_ref
        if int(jax.device_get(n_matches)) < \
                self.cfg.tracking.min_init_mono_matches:
            # too few matches: the reference resets to this frame (:661-668)
            self.ref = frame
            self.ref_frame_id = frame_id
            return None
        if not bool(jax.device_get(ok)):
            return None
        m, q1, t1, kp_mp = self._build_map(
            self.ref, frame, cur_to_ref, res.q, res.t, res.points, res.good,
            jnp.int32(self.ref_frame_id), jnp.int32(frame_id))
        return m, q1, t1, kp_mp, frame
