"""Relocalization: re-acquire the camera pose after tracking loss.

Replaces ``Tracking::Relocalization`` (SURVEY.md §2.2,
``Tracking.cc:1535-1724``): the reference queries the keyframe database for
relocalization candidates, BoW-matches the lost frame against EACH candidate,
runs EPnP RANSAC per candidate, refines with pose optimization, widens
matches by projection when inliers are short, and accepts at >= 50 inliers.

Here the per-candidate ladder (BoW-gated matching -> vmapped EPnP RANSAC ->
pose LM) runs as ONE vmap over the top ``N_CANDIDATES`` database candidates —
the batched equivalent of the reference's candidate loop
(``Tracking.cc:1586-1607``), so a bad top-scoring match (a BoW decoy) cannot
sink the relocalization. The winner by post-LM inlier count then gets the
projection-guided widening pass (``SearchByProjection``, ``Tracking.cc:1655``)
and the final accept gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.frontend import matcher
from orb_slam_2_ros_tpu.frontend.frame import Frame
from orb_slam_2_ros_tpu.map import state as map_state
from orb_slam_2_ros_tpu.place import database, vocabulary
from orb_slam_2_ros_tpu.solvers import pnp
from orb_slam_2_ros_tpu.solvers.pose_opt import pose_optimization

MIN_BOW_MATCHES = 15     # per-candidate gate (Tracking.cc:1586)
MIN_INLIERS_ACCEPT = 50  # final accept (Tracking.cc:1713)
N_CANDIDATES = 5         # candidates swept per attempt (the reference sweeps
                         # every database candidate, typically a handful)


class Relocalizer:
    def __init__(self, cfg: SlamConfig, vocab: vocabulary.Vocabulary):
        self.cfg = cfg
        self.vocab = vocab

        self._relocalize = _compiled_relocalize(cfg, vocab)

    def relocalize(self, m, db, kf_node, frame, key):
        """Returns (ok, q, t, kp_to_mp, n_inliers, candidate_kf) — device
        values; caller fetches `ok` to decide."""
        return self._relocalize(m, db, kf_node, frame, key)


_RELOC_PROGRAM_CACHE = {}


def _compiled_relocalize(cfg: SlamConfig, vocab):
    """One compiled relocalization program per (config, vocabulary) —
    trace reuse across Relocalizer instances (cf.
    loop_closing._compiled_loop_programs)."""
    key = (cfg, id(vocab))
    hit = _RELOC_PROGRAM_CACHE.get(key)
    if hit is not None:
        return hit[0]
    @jax.jit
    def _relocalize(m: map_state.MapState, db: database.BowDatabase,
                    kf_node: jnp.ndarray, frame: Frame, key: jax.Array):
        P = frame.uv.shape[0]

        # ---- frame BoW + top-N candidate keyframes
        wid, nid, tfidf = vocabulary.transform(vocab, frame.kps.desc,
                                               frame.valid)
        wt = vocabulary.bow_weights(wid, tfidf, vocab.num_words)
        covis = map_state.covisibility(m)
        cand = database.detect_candidates(
            db, wid, wt, jnp.zeros((m.K,), bool), covis,
            vocab.num_words, min_score=None)
        scores, _ = database.query(db, wid, wt, vocab.num_words)
        top_scores, top_idx = jax.lax.top_k(
            jnp.where(cand, scores, -1.0), N_CANDIDATES)
        cand_ok = top_scores > 0.0
        has_cand = jnp.any(cand_ok)

        # ---- per-candidate ladder, vmapped (Tracking.cc:1586-1652):
        # BoW-gated matching -> EPnP RANSAC -> pose LM
        def per_candidate(c, c_ok, sub):
            valid_c = (m.kf_kp_valid[c] & (m.kf_mp[c] >= 0)
                       & m.kf_valid[c] & c_ok)
            f_to_c = matcher.search_by_node(
                m.kf_desc[c], kf_node[c], valid_c, m.kf_angle[c],
                frame.kps.desc, nid, frame.valid, frame.kps.angle, cfg)[0]
            kp_mp = jnp.where(f_to_c >= 0,
                              m.kf_mp[c][jnp.clip(f_to_c, 0)], -1)
            n_bow = jnp.sum((kp_mp >= 0).astype(jnp.int32))
            xw = m.mp_pos[jnp.clip(kp_mp, 0)]
            ok_pair = kp_mp >= 0
            q0, t0, pnp_inl, _ = pnp.ransac_pnp(xw, frame.uv, ok_pair,
                                                cfg, sub)
            q1, t1, inl1, n1 = pose_optimization(
                q0, t0, xw, frame.uv, frame.u_right, frame.kps.octave,
                ok_pair & pnp_inl, cfg)
            kp_mp1 = jnp.where(inl1 & ok_pair, kp_mp, -1)
            usable = c_ok & (n_bow >= MIN_BOW_MATCHES)
            return q1, t1, kp_mp1, jnp.where(usable, n1, -1)

        subs = jax.random.split(key, N_CANDIDATES)
        q1s, t1s, kp_mp1s, n1s = jax.vmap(per_candidate)(
            top_idx, cand_ok, subs)

        # winner by post-LM inlier count (first candidate that would
        # clear the reference's while-loop wins there; the argmax picks
        # at least as good a pose)
        best = jnp.argmax(n1s)
        q1, t1 = q1s[best], t1s[best]
        kp_mp1 = jnp.where(n1s[best] >= 0, kp_mp1s[best], -1)
        c = top_idx[best]

        # ---- projection-guided widening (SearchByProjection, :1655)
        tv = matcher.frustum_check(q1, t1, m.mp_pos, m.mp_normal,
                                   m.mp_min_dist, m.mp_max_dist,
                                   m.mp_valid, cfg)
        kp_to_mp2, _ = matcher.search_local_map(tv, m.mp_desc, frame,
                                                kp_mp1 >= 0, cfg)
        kp_mp_w = jnp.where(kp_mp1 >= 0, kp_mp1, kp_to_mp2)
        q2, t2, inl2, n2 = pose_optimization(
            q1, t1, m.mp_pos[jnp.clip(kp_mp_w, 0)], frame.uv,
            frame.u_right, frame.kps.octave, kp_mp_w >= 0, cfg)
        kp_mp_out = jnp.where(inl2, kp_mp_w, -1)

        ok = (has_cand & (n1s[best] >= 0)
              & (n2 >= MIN_INLIERS_ACCEPT))
        return ok, q2, t2, kp_mp_out, n2, c
    _RELOC_PROGRAM_CACHE[key] = (_relocalize, vocab)
    return _relocalize
