"""Local mapping: windowed bundle adjustment + map-point culling.

Replaces the ``LocalMapping`` thread (``LocalMapping.cc``): instead of a
3 ms-polling consumer loop, the host invokes one jitted mapping step on a
cadence (after chunks that inserted keyframes — the software-pipelined
equivalent of SURVEY.md §2.D). The step:

1. local BA (``Optimizer::LocalBundleAdjustment``, ``Optimizer.cc:517-890``):
   the last ``window`` keyframes are free, ALL other keyframes are fixed
   (this subsumes the reference's fixed second ring — every observer outside
   the window constrains its points), points observed by the window are free;
2. outlier observation removal (edge chi2 gates, ``Optimizer.cc:781-860``);
3. map-point culling (``LocalMapping::MapPointCulling``,
   ``LocalMapping.cc:197-236``): points that are old enough but kept fewer
   than ``min_obs_cull`` observations are invalidated;
4. full point-stat refresh (normals/bands/descriptors + incremental pools).

Triangulation of new points between keyframes (CreateNewMapPoints) lands
with the epipolar milestone; RGB-D spawning already provides new points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.solvers import ba


class LocalMapper:
    def __init__(self, cfg: SlamConfig, window: int = 20):
        self.cfg = cfg
        self.window = window

        @jax.jit
        def _mapping_step(m: map_state.MapState):
            K, P, M = m.K, m.P, m.M
            n = m.n_kfs
            rows = jnp.arange(K)
            in_window = (rows >= n - window) & (rows < n) & m.kf_valid
            cam_free = in_window & (rows > 0)

            kp_valid = m.kf_kp_valid & m.kf_valid[:, None]
            prob = ba.build_problem(m.kf_uv, m.kf_ur, m.kf_octave, m.kf_mp,
                                    kp_valid, cfg)
            # free points = observed by at least one window keyframe
            obs = jnp.where((in_window[:, None]) & (m.kf_mp >= 0), m.kf_mp, M)
            mp_free = jnp.zeros((M + 1,), bool).at[obs.ravel()].set(True)[:M]
            mp_free = mp_free & m.mp_valid

            q, t, pos, edge_inl = ba.bundle_adjustment(
                m.kf_q, m.kf_t, cam_free, m.mp_pos, mp_free, prob, cfg,
                phases=(cfg.solver.local_ba_iters1, cfg.solver.local_ba_iters2))

            # drop outlier observations from the table
            inl2d = edge_inl.reshape(K, P)
            had_edge = (m.kf_mp >= 0) & kp_valid
            kf_mp = jnp.where(had_edge & ~inl2d, -1, m.kf_mp)
            m = m._replace(kf_q=q, kf_t=t, mp_pos=pos, kf_mp=kf_mp)

            # map-point culling: old points with too few surviving observations
            cnt = map_state.observation_count(m)
            age = n - m.mp_first_kf     # in keyframes
            cull = m.mp_valid & (age >= 3) & (cnt < cfg.map.min_obs_cull)
            m = m._replace(mp_valid=m.mp_valid & ~cull)
            kf_mp2 = jnp.where(
                (m.kf_mp >= 0) & cull[jnp.clip(m.kf_mp, 0)], -1, m.kf_mp)
            m = m._replace(kf_mp=kf_mp2)

            m = map_state.refresh_point_stats(m, cfg)
            return m, jnp.sum(cull.astype(jnp.int32))

        self._mapping_step = _mapping_step

    def run(self, m: map_state.MapState):
        """One mapping step; returns (new_map, n_culled)."""
        return self._mapping_step(m)
