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

from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_MONOCULAR
from orb_slam_2_ros_tpu.io import trajectory as traj_io
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.pipeline.local_mapping import LocalMapper
from orb_slam_2_ros_tpu.pipeline.tracking import (FrameRecord, Tracker,
                                                  LOST, NOT_INITIALIZED, OK)


def default_vocabulary(cfg: SlamConfig, warn: bool = True):
    """Train a small deterministic vocabulary from seeded random descriptors.

    LAST-RESORT fallback: random 256-bit codes cover descriptor space
    uniformly, which gates matching adequately but gives retrieval-grade
    precision far below a tree trained on real imagery. ``System`` without
    an explicit vocabulary now self-trains from the first tracked chunk's
    own descriptors instead of calling this; the remaining callers
    (``merge_map`` on a vocabulary-less session file) warn loudly. The
    reference ships the pre-trained ORBvoc tree (``README.md:12``);
    production deployments should pass one (place/vocabulary.load_orbvoc /
    load_npz) or train in-domain (train_vocabulary).
    """
    import numpy as np
    if warn:
        import warnings
        warnings.warn(
            "No vocabulary provided: falling back to a RANDOM-descriptor "
            "tree. Loop-closing/relocalization retrieval will be weak; pass "
            "a trained vocabulary (place.vocabulary.load_orbvoc/load_npz) "
            "or let System bootstrap from tracked imagery.", stacklevel=2)
    from orb_slam_2_ros_tpu.place import vocabulary
    rng = np.random.default_rng(cfg.seed)
    train = rng.integers(0, 2 ** 32, (8192, 8), dtype=np.uint32)
    return vocabulary.train_vocabulary(train, cfg, seed=cfg.seed)


class System:
    def __init__(self, cfg: SlamConfig, enable_local_ba: bool = True,
                 ba_window: int = 10, load_map: Optional[str] = None,
                 enable_loop_closing: bool = True, vocab=None, mesh=None):
        from orb_slam_2_ros_tpu.pipeline.metrics import StageTimers
        self.cfg = cfg
        self.timers = StageTimers()
        self.n_resets = 0
        self.n_merges = 0
        self.tracker = Tracker(cfg)
        # the mapper's windowed BA row-shards over the mesh's kf axis when
        # the window divides evenly (parallel/dist_ba.distributed_windowed_ba)
        map_mesh = None
        if mesh is not None and enable_local_ba:
            try:
                if (2 * ba_window) % mesh.shape[cfg.mesh.kf_axis] == 0:
                    map_mesh = mesh
            except KeyError:
                pass
        self.mapper = (LocalMapper(cfg, window=ba_window, mesh=map_mesh)
                       if enable_local_ba else None)
        self.localization_only = cfg.localization_only
        self._culled_dev = []      # device scalars; summed lazily (no fetches)
        # the LoopCloser owns the BoW index (database + node table) shared
        # with the relocalizer; in localization-only mode its correction
        # program is simply never invoked
        self.loop_closing_enabled = enable_loop_closing
        self.loop_closer = None
        self.relocalizer = None
        self.vocab = vocab
        self.mesh = mesh
        # no vocabulary given: DEFER construction of the retrieval stack and
        # self-train a tree from the FIRST tracked chunk's own descriptors
        # (in-domain beats the random-code fallback by a wide margin; the
        # reference instead ships the pre-trained ORBvoc, README.md:12)
        self._vocab_pending = False
        if enable_loop_closing or cfg.localization_only or load_map:
            if self.vocab is None and not load_map:
                self._vocab_pending = True
            else:
                if self.vocab is None:
                    # load_map path: the file usually carries its own vocab
                    # (restored in load_map); this placeholder only survives
                    # for vocabulary-less legacy files
                    self.vocab = default_vocabulary(cfg)
                self._build_retrieval_stack()
        import jax
        self._reloc_key = jax.random.PRNGKey(cfg.seed + 1)
        self._last_frame_inputs = None
        # single packed per-chunk probe (see track_chunk): lagged loop
        # verdict + per-frame states + keyframe-pool level in ONE transfer
        self._neg1 = jnp.int32(-1)
        self._pack_probe = jax.jit(lambda outs, cand, k, nk: jnp.concatenate(
            [jnp.stack([cand.astype(jnp.float32), k.astype(jnp.float32),
                        nk.astype(jnp.float32)]), outs[:, 3]]))
        # keyframe-pool recycling: every KF_COMPACT_CHECK_EVERY chunks one
        # scalar fetch checks the pool level; above the watermark the culled
        # rows are compacted away (Map::EraseKeyFrame, Map.cc:81-97)
        self._chunks_since_kf_check = 0
        self._kf_compact_watermark = 0.85
        self._kf_probe = None       # in-flight n_kfs device scalar
        self.n_kf_compactions = 0
        # monocular bootstrap (MonocularInitialization, Tracking.cc:633-816)
        self.mono_init = None
        self._mono_initialized = cfg.sensor != SENSOR_MONOCULAR
        self._frame_counter = 0
        if cfg.sensor == SENSOR_MONOCULAR:
            from orb_slam_2_ros_tpu.pipeline.mono_init import MonoInitializer
            self.mono_init = MonoInitializer(cfg)
        if load_map:
            self.load_map(load_map)
            self._mono_initialized = True

    def _build_retrieval_stack(self):
        """Construct the Relocalizer + LoopCloser around self.vocab. The
        LoopCloser owns the BoW index (database + node table) shared with
        the relocalizer; mesh (optional jax.sharding.Mesh): the loop GBA
        shards its edge set over cfg.mesh.mp_axis and psums every reduction
        over ICI (SURVEY.md §2.D; parallel/dist_ba.py)."""
        from orb_slam_2_ros_tpu.pipeline.loop_closing import LoopCloser
        from orb_slam_2_ros_tpu.pipeline.relocalization import Relocalizer
        self.relocalizer = Relocalizer(self.cfg, self.vocab)
        self.loop_closer = LoopCloser(self.cfg, self.vocab,
                                      background_gba=True, mesh=self.mesh)

    def _bootstrap_vocabulary(self, grays):
        """Train the vocabulary from the first tracked chunk's descriptors
        (up to 4 frames sampled across the batch), then build the retrieval
        stack. One-time host event before any keyframe is BoW-ingested."""
        import jax
        from orb_slam_2_ros_tpu.frontend import frame as frame_mod
        from orb_slam_2_ros_tpu.place import vocabulary
        n = len(grays)
        descs = []
        for i in list(range(0, n, max(1, n // 4)))[:4]:
            f = frame_mod.build_mono(
                jnp.asarray(grays[i], jnp.float32), self.cfg)
            descs.append(np.asarray(jax.device_get(f.kps.desc))[
                np.asarray(jax.device_get(f.valid))])
        train = np.concatenate(descs) if descs else None
        if train is None or len(train) < 64:
            self.vocab = default_vocabulary(self.cfg)
        else:
            self.vocab = vocabulary.train_vocabulary(train, self.cfg,
                                                     seed=self.cfg.seed)
        self._build_retrieval_stack()
        self._vocab_pending = False

    # ------------------------------------------------------------- tracking

    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray,
                   timestamp: float) -> FrameRecord:
        return self.track_chunk(gray[None], depth[None], [timestamp])[0]

    def track_chunk(self, grays, depths=None, timestamps=None,
                    defer_fetch: bool = False) -> List[FrameRecord]:
        """Track a batch of frames. Accepts float images (converted to the
        wire format on the way in) or wire-format arrays straight from the
        native prefetcher (u8 gray + u16 mm depth / u8 right image,
        io/datasets.make_prefetcher) — detected by dtype."""
        # dtype sniffing must NOT materialize device arrays on the host:
        # np.asarray on a staged jax array is a full device->host copy of
        # the chunk (~15 MB through the relay) on EVERY call
        dt = getattr(grays, "dtype", None)
        if dt is None:
            grays = np.asarray(grays)
            dt = grays.dtype
        wire = dt == np.uint8
        if not wire:
            grays = np.asarray(grays, np.float32)
        if self._vocab_pending:
            self._bootstrap_vocabulary(grays)
        if depths is None:      # monocular: the aux channel is unused
            depths = np.zeros_like(grays)
        if timestamps is None:
            timestamps = [self._frame_counter + i / 30.0
                          for i in range(len(grays))]
        init_recs: List[FrameRecord] = []
        if not self._mono_initialized:
            consumed = 0
            for i in range(len(grays)):
                out = self.mono_init.process(
                    np.asarray(grays[i], np.float32),
                    self._frame_counter + i)
                consumed = i + 1
                if out is not None:
                    m, q1, t1, kp_mp, cur = out
                    self._adopt_mono_init(m, q1, t1, kp_mp, cur,
                                          consumed, init_recs, timestamps)
                    break
                init_recs.append(self._placeholder_record(
                    timestamps[i], NOT_INITIALIZED, offset=len(init_recs)))
            self.tracker.records.extend(init_recs)
            if not self._mono_initialized:
                self._frame_counter += len(grays)
                return init_recs
            grays = grays[consumed:]
            depths = depths[consumed:]
            timestamps = list(timestamps)[consumed:]
            if len(grays) == 0:
                self._frame_counter += consumed
                return init_recs
            self._frame_counter += consumed
        # software pipeline over tracker-sized chunks: track -> local map ->
        # loop closing per chunk (the per-keyframe cadence of the reference's
        # LocalMapping/LoopClosing consumer threads, SURVEY.md §2.D)
        recs: List[FrameRecord] = []
        C = self.tracker.chunk
        lc = self.loop_closer
        loop_on = (lc is not None and self.loop_closing_enabled
                   and not self.localization_only)
        for w0 in range(0, len(grays), C):
            w1 = min(w0 + C, len(grays))
            carry_before = self.tracker.carry   # device refs (zero-copy)
            with self.timers.time("tracking"):
                self.tracker.process_chunk(
                    grays[w0:w1], depths[w0:w1], timestamps[w0:w1],
                    defer_fetch=True, prestaged=wire)
            # mapping: one step per chunk, gated ON DEVICE — the program
            # no-ops via lax.cond unless the chunk inserted a keyframe
            # (the reference's LocalMapping thread idles while its queue is
            # empty, LocalMapping.cc:50-126)
            gba_running = lc is not None and lc.gba_running
            if self.mapper is not None and not self.localization_only:
                with self.timers.time("local_mapping"):
                    m2, n_culled, last_mp2 = self.mapper.run(
                        self.tracker.carry.m, self.tracker.carry.last_mp,
                        allow_compact=not gba_running, full=True)
                    self.tracker.carry = self.tracker.carry._replace(
                        m=m2, last_mp=last_mp2)
                    self._culled_dev.append(n_culled)
            if loop_on:
                with self.timers.time("loop_closing"):
                    # detection dispatch only — the verdict is consumed at
                    # a fixed ONE-CHUNK lag through the packed probe below
                    lc.dispatch(self.tracker.carry.m)
                    # background GBA: one chunk per tracking chunk, so the
                    # heavy refinement never stalls the camera (the
                    # reference's detached GBA thread, LoopClosing.cc:689)
                    m3, finished = lc.step_background(self.tracker.carry.m)
                    if finished:
                        self.tracker.adopt_map(m3)
            # ---- SINGLE packed probe fetch per chunk. Every host decision
            # rides ONE small device->host transfer (a lagged loop verdict,
            # this chunk's per-frame states for the relocalization probe,
            # and the keyframe-pool level): each extra synchronous fetch
            # through the remote-TPU relay costs tens of milliseconds and
            # can drop the runtime into its slow per-launch mode (measured
            # r5: splitting these into 2-3 fetches cost ~3x end-to-end).
            # The schedule depends only on chunk count -> deterministic.
            vals = self._probe_fetch()
            if vals is not None:
                cand, k_i, n_kfs, states = vals
                if loop_on and cand is not None:
                    with self.timers.time("loop_closing"):
                        m2, closed = lc.consume_host(
                            self.tracker.carry.m, cand, k_i)
                        if closed:
                            self.tracker.adopt_map(m2)
                # per-frame relocalization (Tracking.cc:341-346): LOST
                # frames trigger relocalization attempts (every lost frame,
                # like the reference's per-frame retry) + a host-level
                # chunk replay around the first success (lost-lag <= 1
                # frame, see _replay_chunk)
                if self.relocalizer is not None and (states == LOST).any():
                    ok = False
                    with self.timers.time("relocalization"):
                        for f in np.flatnonzero(states == LOST):
                            gray, depth = self._to_float_frame(
                                grays[w0 + f], depths[w0 + f], wire)
                            ok, q, t, kp_mp, frame = self._attempt_reloc(
                                gray, depth)
                            if ok:
                                self._replay_chunk(
                                    carry_before, grays[w0:w1],
                                    depths[w0:w1],
                                    list(timestamps[w0:w1]), int(f), wire,
                                    q, t, kp_mp, frame)
                                break
                    # auto-reset: lost with a barely-started map
                    # (Tracking.cc:508-516, min_num_kf_in_map)
                    if not ok and not self.localization_only and \
                            self.tracker.n_kfs <= \
                            self.cfg.tracking.min_num_kf_in_map:
                        self.reset()
                # keyframe-pool recycling: above the watermark, culled rows
                # are compacted away so insertion never starves
                # (Map::EraseKeyFrame, Map.cc:81-97); rare host event
                if (self.mapper is not None and not self.localization_only
                        and not (lc is not None and lc.gba_running)
                        and n_kfs >= int(self._kf_compact_watermark
                                         * self.tracker.carry.m.K)):
                    self.compact_keyframe_pool()
        self._frame_counter += len(grays)
        # keep REFERENCES (possibly device-resident, wire-format); the rare
        # consumers (relocalize, render_debug_image) convert on demand via
        # _last_frame_float — converting here forced two device->host frame
        # copies per chunk on the hot path
        self._last_frame_inputs = (grays[-1], depths[-1], wire)
        if not defer_fetch:
            recs = self.tracker.flush()
        # localization-VO re-anchoring: tracking survives on temporal points
        # but the map is out of sight (mbVO, Tracking.cc:385-417) — keep
        # attempting relocalization to re-acquire map matches (LOST frames
        # are handled per chunk by the in-loop probe above)
        if (recs and self.localization_only and self.relocalizer is not None
                and recs[-1].state == OK and recs[-1].n_map_inliers < 10):
            with self.timers.time("relocalization"):
                self.relocalize()
        return init_recs + recs

    def _probe_fetch(self):
        """One packed device->host transfer carrying every per-chunk host
        decision input: the LAGGED loop-detection verdict (cand, k), the
        just-tracked chunk's per-frame state codes, and the keyframe count.
        Returns (cand | None, k_i, n_kfs, states) or None before any chunk
        has been tracked."""
        if self.tracker._last_outs is None:
            return None
        outs, kc = self.tracker._last_outs
        lc = self.loop_closer
        have_verdict = lc is not None and len(lc._pending_verdict) > 1
        if have_verdict:
            cand_dev, k_dev = lc._pending_verdict.pop(0)
        else:
            cand_dev = k_dev = self._neg1
        packed = self._pack_probe(outs, cand_dev, k_dev,
                                  self.tracker.carry.m.n_kfs)
        vals = np.asarray(jax.device_get(packed))
        cand = int(vals[0]) if have_verdict else None
        return cand, int(vals[1]), int(vals[2]), vals[3:3 + kc].astype(int)

    def compact_keyframe_pool(self) -> int:
        """Recycle culled keyframe rows (``Map::EraseKeyFrame``,
        ``Map.cc:81-97``). Rare host-synchronous event: culled keyframes
        stop serving as trajectory reference anchors, so affected
        FrameRecords are re-based onto their nearest surviving predecessor
        at the CURRENT poses — the functional analog of the ``mTcp``
        relative-pose retention in ``KeyFrame::SetBadFlag``
        (``KeyFrame.cc:553-671``). Returns the number of rows freed."""
        from orb_slam_2_ros_tpu.pipeline.tracking import (_quat_mul_np,
                                                          _quat_rotate_np)
        self.tracker.flush()   # pending records still index old rows
        m = self.tracker.carry.m
        m2, remap = map_state.compact_keyframes(m)
        remap_np = np.asarray(jax.device_get(remap))
        n_freed = int(np.sum((remap_np < 0)
                             & (np.arange(len(remap_np))
                                < int(jax.device_get(m.n_kfs)))))
        if n_freed == 0:
            return 0
        kf_q = np.asarray(jax.device_get(m.kf_q))
        kf_t = np.asarray(jax.device_get(m.kf_t))
        K = len(remap_np)
        anchor = np.maximum.accumulate(
            np.where(remap_np >= 0, np.arange(K), -1))
        first_kept = int(np.argmax(remap_np >= 0))
        for r in self.tracker.records:
            if r.ref_kf is None or r.ref_kf < 0 or r.q_cr is None:
                continue
            old = r.ref_kf
            if remap_np[old] >= 0:
                r.ref_kf = int(remap_np[old])
                continue
            a = int(anchor[old]) if anchor[old] >= 0 else first_kept
            # T_cw = T_cr . T_rw (current); T_cr' = T_cw . T_aw^-1
            q_cw = _quat_mul_np(r.q_cr, kf_q[old])
            t_cw = _quat_rotate_np(r.q_cr, kf_t[old]) + r.t_cr
            qa, ta = kf_q[a], kf_t[a]
            qa_i = np.array([qa[0], -qa[1], -qa[2], -qa[3]])
            ta_i = -_quat_rotate_np(qa_i, ta)
            r.q_cr = _quat_mul_np(q_cw, qa_i)
            r.t_cr = _quat_rotate_np(q_cw, ta_i) + t_cw
            r.ref_kf = int(remap_np[a])
        self.tracker.carry = self.tracker.carry._replace(m=m2)
        # the mapper gates on "n_kfs moved past the last post-step count";
        # compaction shrinks n_kfs below that watermark, so re-arm it or
        # every keyframe inserted until the count re-exceeds the stale
        # pre-compaction value would silently skip local mapping
        if self.mapper is not None:
            self.mapper._prev_n_kfs = jnp.int32(-1)
        if self.loop_closer is not None:
            self.loop_closer.apply_kf_compaction(remap_np)
        self._kf_probe = None
        self.n_kf_compactions += 1
        return n_freed

    def reset(self):
        """Full map + tracker reset (``Tracking::Reset``,
        ``Tracking.cc:1727-1765``; ``System::Reset`` flag protocol becomes a
        plain call on the functional state)."""
        self.tracker.carry = self.tracker._fresh_carry(
            map_state.empty(self.cfg))
        self.tracker.state = NOT_INITIALIZED
        if self.mapper is not None:
            self.mapper._prev_n_kfs = jnp.int32(-1)
        if self.loop_closer is not None:
            from orb_slam_2_ros_tpu.pipeline.loop_closing import empty_state
            self.loop_closer.state = empty_state(self.cfg)
            self.loop_closer.gba = None    # abort any in-flight GBA
            self.loop_closer._pending_verdict = []
        if self.mono_init is not None:
            self.mono_init.ref = None
            self._mono_initialized = False
        self._kf_probe = None
        self.n_resets += 1

    @property
    def last_big_change_idx(self) -> int:
        """Counter of global map rewrites — loop corrections (+GBA), resets,
        session merges. Consumers compare against a remembered value to
        decide when to re-read the whole map, like
        ``Map::GetLastBigChangeIdx`` (``Map.cc:76-86``,
        ``System.cc:304-315``)."""
        loops = self.loop_closer.n_loops_closed if self.loop_closer else 0
        return loops + self.n_resets + self.n_merges

    def metrics(self) -> dict:
        """Run summary (SURVEY.md §5.5): counters + per-stage timing."""
        m = self.tracker.map
        recs = self.tracker.records
        return {
            "frames": len(recs),
            "big_change_idx": self.last_big_change_idx,
            "keyframes": int(jax.device_get(m.n_kfs)),
            "map_points": int(np.asarray(jax.device_get(m.mp_valid)).sum()),
            "points_culled": self.n_culled_total,
            "loops_closed": (self.loop_closer.n_loops_closed
                             if self.loop_closer else 0),
            "resets": self.n_resets,
            "stages": self.timers.summary(),
        }

    def _placeholder_record(self, ts, state, offset=0) -> FrameRecord:
        return FrameRecord(
            frame_id=len(self.tracker.records) + offset, timestamp=float(ts),
            state=state, n_matches_frame=0, n_inliers=0, is_keyframe=False,
            R_wc=np.eye(3, dtype=np.float32),
            c_w=np.zeros(3, dtype=np.float32))

    def _adopt_mono_init(self, m, q1, t1, kp_mp, cur, consumed, init_recs,
                         timestamps):
        """Install the two-keyframe monocular map and bootstrap the tracker
        from keyframe 1's pose (CreateInitialMapMonocular tail,
        Tracking.cc:802-816)."""
        import jax
        import jax.numpy as jnp
        tr = self.tracker
        tr.carry = tr._fresh_carry(m, initialized=True)
        tr.force_pose(q1, t1, kp_mp, cur.kps.octave, cur.kps.angle)
        tr.carry = tr.carry._replace(
            frame_id=jnp.int32(consumed),
            # seed the keyframe-decision reference count (Tracking.cc:1160:
            # nRefMatches of the reference keyframe)
            ref_tracked=jnp.sum((kp_mp >= 0).astype(jnp.int32)))
        self._mono_initialized = True
        # records for frames consumed by init that are not yet recorded
        for i in range(len(init_recs), consumed):
            init_recs.append(self._placeholder_record(
                timestamps[i], NOT_INITIALIZED, offset=len(init_recs)))
        if init_recs:
            init_recs[-1] = self._placeholder_record(
                timestamps[consumed - 1], OK, offset=len(init_recs) - 1)

    @staticmethod
    def _to_float_frame(g, d, wire):
        """Materialize one frame's (gray, aux) as float host arrays
        (metres for RGB-D depth). Rare host event — the hot path stores
        wire-format references only."""
        g_np = np.asarray(jax.device_get(g)).astype(np.float32)
        d_np = np.asarray(jax.device_get(d))
        aux = d_np.astype(np.float32)
        if wire and d_np.dtype == np.uint16:
            aux *= 1e-3   # u16 millimetres -> metres
        return g_np, aux

    def _last_frame_float(self):
        g, d, wire = self._last_frame_inputs
        return self._to_float_frame(g, d, wire)

    def _attempt_reloc(self, gray, depth):
        """Run the relocalization ladder on one float frame against the
        current map + BoW index (``Tracking::Relocalization``,
        ``Tracking.cc:1535-1724``). Returns (ok, q, t, kp_mp, frame) —
        the caller decides when to ``force_pose`` (the chunk replay applies
        it mid-chunk)."""
        from orb_slam_2_ros_tpu.frontend import frame as frame_mod
        m = self.tracker.carry.m
        lc = self.loop_closer
        # the index may lag the map: ingest any missing keyframes first
        for _ in range(m.K):
            if int(jax.device_get(lc.state.n_ingested)) >= \
                    int(jax.device_get(m.n_kfs)):
                break
            lc.state, _, _ = lc._ingest_and_detect(m, lc.state)
        if self.cfg.sensor == SENSOR_MONOCULAR:
            frame = frame_mod.build_mono(jnp.asarray(gray, jnp.float32),
                                         self.cfg)
        else:
            frame = frame_mod.build_rgbd(jnp.asarray(gray, jnp.float32),
                                         jnp.asarray(depth, jnp.float32),
                                         self.cfg)
        self._reloc_key, sub = jax.random.split(self._reloc_key)
        ok, q, t, kp_mp, n_inl, c = self.relocalizer.relocalize(
            m, lc.state.db, lc.state.kf_node, frame, sub)
        return bool(jax.device_get(ok)), q, t, kp_mp, frame

    def relocalize(self) -> bool:
        """Attempt relocalization with the most recent frame
        (``Tracking::Relocalization``). Returns success."""
        if self._last_frame_inputs is None or self.loop_closer is None:
            return False
        gray, depth = self._last_frame_float()
        ok, q, t, kp_mp, frame = self._attempt_reloc(gray, depth)
        if ok:
            self.tracker.force_pose(q, t, kp_mp, frame.kps.octave,
                                    frame.kps.angle)
        return ok

    def _replay_chunk(self, carry_before, grays, depths, timestamps,
                      f: int, wire: bool, q, t, kp_mp, frame):
        """Host-level chunk replay around a successful relocalization at
        frame ``f`` (per-frame reloc semantics, ``Tracking.cc:341-346``):
        restore the pre-chunk carry, re-track frames [0, f) (deterministic
        — identical results), force the relocalized pose, then re-track
        [f, end) from it — the relocalized frame itself re-tracks from the
        forced pose (the reference's post-reloc TrackLocalMap pass), so
        lost-lag is <= 1 frame instead of a whole chunk."""
        self.tracker.pop_pending()
        self.tracker.carry = carry_before
        if f > 0:
            self.tracker.process_chunk(grays[:f], depths[:f],
                                       timestamps[:f], defer_fetch=True,
                                       prestaged=wire)
        self.tracker.force_pose(q, t, kp_mp, frame.kps.octave,
                                frame.kps.angle)
        self.tracker.process_chunk(grays[f:], depths[f:], timestamps[f:],
                                   defer_fetch=True, prestaged=wire)

    def flush(self) -> List[FrameRecord]:
        """Drain deferred work (queued loop-detection verdicts) and fetch
        all pending frame records. Call at end of a sequence / before
        reading trajectories or loop counters."""
        if (self.loop_closer is not None and self.loop_closing_enabled
                and not self.localization_only):
            m2, closed = self.loop_closer.finish_pending(self.tracker.carry.m)
            if closed:
                self.tracker.adopt_map(m2)
            # drain any in-flight chunked GBA: trajectories read after a
            # flush must reflect the COMPLETED refinement, exactly like the
            # reference's GBA thread finishing and propagating before the
            # trajectory savers run (``LoopClosing.cc:758-862``)
            if self.loop_closer.gba_running:
                m3 = self.loop_closer.run_gba_to_completion(
                    self.tracker.carry.m)
                self.tracker.adopt_map(m3)
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
        """Persist the full map pytree PLUS the vocabulary and the loop
        closer's BoW index / persistent loop edges. The reference archives
        the Map AND the KeyFrameDatabase together and rebinds the
        vocabulary on load (``System::SaveMap/LoadMap``,
        ``System.cc:610-691``, KFDB at ``:625-630``) — saving the map alone
        would silently break relocalization/loop closing against a
        different vocabulary. npz replaces boost serialization (no 64 MB
        stack hack: the map is a flat array pytree)."""
        m = self.tracker.map
        arrays = {f: np.asarray(jax.device_get(v))
                  for f, v in zip(m._fields, m)}
        if self.vocab is not None:
            arrays["vocab__node_desc"] = np.asarray(self.vocab.node_desc)
            arrays["vocab__word_weight"] = np.asarray(self.vocab.word_weight)
            arrays["vocab__klu"] = np.array(
                [self.vocab.k, self.vocab.levels, self.vocab.levels_up],
                np.int32)
        if self.loop_closer is not None:
            st = self.loop_closer.state
            for name in ("kf_node", "consist_cnt", "n_ingested",
                         "last_loop_kf", "loop_ei", "loop_ej", "loop_rq",
                         "loop_rt", "loop_rs", "n_loop_edges"):
                arrays["loop__" + name] = np.asarray(
                    jax.device_get(getattr(st, name)))
            for name in ("kf_word", "kf_wt", "kf_valid"):
                arrays["loop__db_" + name] = np.asarray(
                    jax.device_get(getattr(st.db, name)))
        np.savez_compressed(path, **arrays)
        return True

    def load_map(self, path: str) -> bool:
        """Load a saved map, rebind the saved vocabulary, and restore the
        BoW index + loop edges so relocalization and loop closing work
        against the loaded map (``System::LoadMap``, ``System.cc:647-691``:
        deserialize Map + KeyFrameDatabase, rebind vocab)."""
        data = np.load(path)
        empty_m = map_state.empty(self.cfg)
        m = map_state.MapState(**{
            f: (jnp.asarray(data[f]) if f in data.files
                else getattr(empty_m, f))
            for f in map_state.MapState._fields})
        self.tracker.attach_map(m)
        if "vocab__node_desc" in data.files:
            from orb_slam_2_ros_tpu.pipeline.loop_closing import LoopCloser
            from orb_slam_2_ros_tpu.pipeline.relocalization import Relocalizer
            from orb_slam_2_ros_tpu.place.vocabulary import Vocabulary
            k, levels, lu = (int(x) for x in data["vocab__klu"])
            self.vocab = Vocabulary(
                node_desc=jnp.asarray(data["vocab__node_desc"]),
                word_weight=jnp.asarray(data["vocab__word_weight"]),
                k=k, levels=levels, levels_up=lu)
            self.relocalizer = Relocalizer(self.cfg, self.vocab)
            self.loop_closer = LoopCloser(self.cfg, self.vocab,
                                          background_gba=True,
                                          mesh=self.mesh)
        if self.loop_closer is not None and "loop__n_ingested" in data.files:
            st = self.loop_closer.state
            db = st.db._replace(
                kf_word=jnp.asarray(data["loop__db_kf_word"]),
                kf_wt=jnp.asarray(data["loop__db_kf_wt"]),
                kf_valid=jnp.asarray(data["loop__db_kf_valid"]))
            self.loop_closer.state = st._replace(
                db=db,
                kf_node=jnp.asarray(data["loop__kf_node"]),
                consist_cnt=jnp.asarray(data["loop__consist_cnt"]),
                n_ingested=jnp.asarray(data["loop__n_ingested"]),
                last_loop_kf=jnp.asarray(data["loop__last_loop_kf"]),
                loop_ei=jnp.asarray(data["loop__loop_ei"]),
                loop_ej=jnp.asarray(data["loop__loop_ej"]),
                loop_rq=jnp.asarray(data["loop__loop_rq"]),
                loop_rt=jnp.asarray(data["loop__loop_rt"]),
                loop_rs=jnp.asarray(data["loop__loop_rs"]),
                n_loop_edges=jnp.asarray(data["loop__n_loop_edges"]))
        return True

    def merge_map(self, path: str, fix_scale: bool = None) -> bool:
        """Merge a previously saved session's map into the live one
        (multi-session joint mapping, pipeline/map_merge.py): align by
        place recognition + Sim3, concatenate, and let the loop closer
        weld the seam on its next pass. Returns success."""
        from orb_slam_2_ros_tpu.config import SENSOR_MONOCULAR
        from orb_slam_2_ros_tpu.pipeline import map_merge
        data = np.load(path)
        empty_m = map_state.empty(self.cfg)
        m2 = map_state.MapState(**{
            f: (jnp.asarray(data[f]) if f in data.files
                else getattr(empty_m, f))
            for f in map_state.MapState._fields})
        if self.vocab is None:
            self.vocab = default_vocabulary(self.cfg)
        if fix_scale is None:
            fix_scale = self.cfg.sensor != SENSOR_MONOCULAR
        merged, info = map_merge.merge_maps(
            self.tracker.carry.m, m2, self.vocab, self.cfg,
            fix_scale=fix_scale)
        if merged is None:
            return False
        self.tracker.adopt_map(merged)
        self.n_merges += 1
        if self.loop_closer is not None:
            # force the BoW index to re-ingest from scratch so the merged
            # rows enter the database
            from orb_slam_2_ros_tpu.pipeline.loop_closing import empty_state
            self.loop_closer.state = empty_state(self.cfg)
            self.loop_closer._pending_verdict = []
        return True

    # --------------------------------------------------------- trajectories

    def save_trajectory_tum(self, path: str):
        """Full-frame trajectory composed through reference keyframes so it
        reflects all BA / loop corrections; lost frames skipped
        (``System::SaveTrajectoryTUM``, ``System.cc:343-401``)."""
        poses, ts = self.tracker.composed_trajectory(skip_lost=True)
        traj_io.write_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path: str):
        m = self.tracker.map
        n = int(jax.device_get(m.n_kfs))
        valid = np.asarray(jax.device_get(m.kf_valid))[:n]
        kf_q = np.asarray(jax.device_get(m.kf_q))[:n][valid]
        kf_t = np.asarray(jax.device_get(m.kf_t))[:n][valid]
        fids = np.asarray(jax.device_get(m.kf_frame_id))[:n][valid]
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
        """KITTI-format trajectory, composed like the TUM saver but keeping
        every frame (``System::SaveTrajectoryKITTI``, ``System.cc:441-494``
        does not gate on mbLost)."""
        poses, _ = self.tracker.composed_trajectory(skip_lost=False)
        traj_io.write_kitti(path, poses)

    # -------------------------------------------------------------- getters

    @property
    def records(self):
        return self.tracker.records

    def render_debug_image(self) -> Optional[np.ndarray]:
        """Annotated tracking image from the current state (the
        ``FrameDrawer`` + ``PublishRenderedImage`` path,
        ``ros/src/Node.cc:200-206``). Requires at least one tracked chunk."""
        if self._last_frame_inputs is None:
            return None
        from orb_slam_2_ros_tpu.frontend import frame as frame_mod
        from orb_slam_2_ros_tpu.pipeline import frame_drawer
        gray, depth = self._last_frame_float()
        if self.cfg.sensor == SENSOR_MONOCULAR:
            frame = frame_mod.build_mono(jnp.asarray(gray, jnp.float32),
                                         self.cfg)
        else:
            frame = frame_mod.build_rgbd(jnp.asarray(gray, jnp.float32),
                                         jnp.asarray(depth, jnp.float32),
                                         self.cfg)
        carry = self.tracker.carry
        kp_has_map = np.asarray(jax.device_get(carry.last_mp)) >= 0
        # temporal-VO matches of the last tracked frame -> blue points
        # (``FrameDrawer.cc:133-139``; non-empty only in localization mode)
        kp_has_vo = np.asarray(jax.device_get(carry.last_vo))
        # during monocular initialization: reference keypoints + current
        # match vector -> green match lines (``FrameDrawer.cc:92-105``)
        init_ref_xy = init_matches = None
        if (not self._mono_initialized and self.mono_init is not None
                and self.mono_init.ref is not None
                and self.mono_init.last_matches is not None):
            init_ref_xy = np.asarray(jax.device_get(self.mono_init.ref.uv))
            init_matches = np.asarray(
                jax.device_get(self.mono_init.last_matches))
        rec = self.records[-1] if self.records else None
        m = self.tracker.map
        return frame_drawer.draw_frame(
            gray, np.asarray(jax.device_get(frame.kps.xy)),
            np.asarray(jax.device_get(frame.valid)), kp_has_map,
            state=self.tracker.state,
            n_matches=rec.n_inliers if rec else 0,
            n_kfs=int(jax.device_get(m.n_kfs)),
            n_mps=int(np.asarray(jax.device_get(m.mp_valid)).sum()),
            localization_only=self.localization_only,
            kp_has_vo=kp_has_vo, init_ref_xy=init_ref_xy,
            init_matches=init_matches)

    def map_points(self, min_observations: int = 0) -> np.ndarray:
        """(N, 3) valid map-point positions (the PointCloud2 analog,
        ``ros/src/Node.cc:244-289``). ``min_observations`` filters weakly
        observed points like ``min_observations_for_ros_map``
        (``ros/src/Node.cc:277-286``, dynamic-reconfigure default 4)."""
        m = self.tracker.map
        pos = np.asarray(jax.device_get(m.mp_pos))
        valid = np.asarray(jax.device_get(m.mp_valid))
        if min_observations > 0:
            cnt = np.asarray(jax.device_get(map_state.observation_count(m)))
            valid = valid & (cnt >= min_observations)
        return pos[valid]
