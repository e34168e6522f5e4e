"""System facade: the top-level API of the engine.

Mirrors ``System.cc`` (§2.1 of SURVEY.md): construction wires tracking and
local mapping (the thread spawn + pointer wiring of ``System.cc:121-138``
becomes plain composition), ``track_rgbd``/``track_chunk`` replace
``TrackRGBD`` (``System.cc:196``), map persistence replaces the boost
serialization service (``System::SaveMap/LoadMap``, ``System.cc:610-691`` —
no 64 MB stack hack needed: the map is a flat array pytree), and the
trajectory savers replace ``SaveTrajectoryTUM/KITTI``
(``System.cc:343-494``). Localization-only mode freezes the map like
``ActivateLocalizationMode`` (``System.cc:578-605``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.io import trajectory as traj_io
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.pipeline.local_mapping import LocalMapper
from orb_slam_2_ros_tpu.pipeline.tracking import (FrameRecord, Tracker,
                                                  NOT_INITIALIZED, OK)


class System:
    def __init__(self, cfg: SlamConfig, enable_local_ba: bool = True,
                 ba_window: int = 20, load_map: Optional[str] = None):
        self.cfg = cfg
        self.tracker = Tracker(cfg)
        self.mapper = LocalMapper(cfg, window=ba_window) if enable_local_ba else None
        self.localization_only = cfg.localization_only
        self._culled_dev = []      # device scalars; summed lazily (no fetches)
        if load_map:
            self.load_map(load_map)

    # ------------------------------------------------------------- tracking

    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray,
                   timestamp: float) -> FrameRecord:
        return self.track_chunk(gray[None], depth[None], [timestamp])[0]

    def track_chunk(self, grays, depths, timestamps,
                    defer_fetch: bool = False) -> List[FrameRecord]:
        recs = self.tracker.process_chunk(grays, depths, timestamps,
                                          defer_fetch=defer_fetch)
        # mapping cadence: one windowed-BA step per chunk, unconditionally —
        # checking "was a keyframe inserted?" would need a device fetch,
        # which permanently degrades the relay's launch latency
        if self.mapper is not None and not self.localization_only:
            m2, n_culled = self.mapper.run(self.tracker.carry.m)
            self.tracker.carry = self.tracker.carry._replace(m=m2)
            self._culled_dev.append(n_culled)
        return recs

    def flush(self) -> List[FrameRecord]:
        return self.tracker.flush()

    @property
    def n_culled_total(self) -> int:
        if not self._culled_dev:
            return 0
        return int(np.sum(jax.device_get(self._culled_dev)))

    # ----------------------------------------------------------------- mode

    def activate_localization_mode(self):
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    # ------------------------------------------------------------- map I/O

    def save_map(self, path: str) -> bool:
        """Persist the full map pytree (npz). Replaces the boost pointer-graph
        serialization (``System.cc:610-644``)."""
        m = self.tracker.map
        arrays = {f: np.asarray(jax.device_get(v))
                  for f, v in zip(m._fields, m)}
        np.savez_compressed(path, **arrays)
        return True

    def load_map(self, path: str) -> bool:
        """Load a saved map and enter localization against it
        (``System::LoadMap``, ``System.cc:647-691``)."""
        data = np.load(path)
        m = map_state.MapState(**{f: jnp.asarray(data[f])
                                  for f in map_state.MapState._fields})
        self.tracker.attach_map(m)
        return True

    # --------------------------------------------------------- trajectories

    def save_trajectory_tum(self, path: str):
        poses, ts = self.tracker.trajectory_wc()
        traj_io.write_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path: str):
        m = self.tracker.map
        n = int(jax.device_get(m.n_kfs))
        kf_q = np.asarray(jax.device_get(m.kf_q))[:n]
        kf_t = np.asarray(jax.device_get(m.kf_t))[:n]
        fids = np.asarray(jax.device_get(m.kf_frame_id))[:n]
        recs = self.tracker.records
        poses, ts = [], []
        for q, t, fid in zip(kf_q, kf_t, fids):
            # invert world->camera on host
            w, x, y, z = q
            R_cw = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])
            poses.append((R_cw.T, -R_cw.T @ t))
            ts.append(recs[fid].timestamp if 0 <= fid < len(recs) else 0.0)
        traj_io.write_tum(path, ts, poses)

    def save_trajectory_kitti(self, path: str):
        poses, _ = self.tracker.trajectory_wc()
        traj_io.write_kitti(path, poses)

    # -------------------------------------------------------------- getters

    @property
    def records(self):
        return self.tracker.records

    def map_points(self) -> np.ndarray:
        """(N, 3) valid map-point positions (the PointCloud2 analog,
        ``ros/src/Node.cc:244-289``)."""
        m = self.tracker.map
        pos = np.asarray(jax.device_get(m.mp_pos))
        valid = np.asarray(jax.device_get(m.mp_valid))
        return pos[valid]
