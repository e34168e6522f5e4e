"""Keyframe BoW database: loop / relocalization candidate retrieval.

TPU-native replacement of ``KeyFrameDatabase`` (SURVEY.md §2.15,
``KeyFrameDatabase.cc``): the reference keeps an inverted file
``word -> list<KeyFrame>`` (``:34-47``) and walks it per query. Here each
keyframe row stores its (merged, L1-normalized) sparse BoW as fixed-shape
``(P,)`` word-id/weight arrays; a query is scattered once into a dense
``(num_words,)`` vector, and scores + shared-word counts for ALL keyframes
come from one ``(K, P)`` gather — the whole database is scored per query in a
single fused pass instead of list walking.

Candidate selection replicates the two-stage scheme of
``DetectLoopCandidates`` (``KeyFrameDatabase.cc:82-235``):
 1. share-a-word keyframes minus the excluded set, kept only if
    ``commonWords > 0.8 * maxCommonWords`` and ``score >= minScore``;
 2. covisibility-group score accumulation over each candidate's top-10
    covisible neighbors, keeping groups above ``0.75 * bestAccScore`` and
    returning each kept group's best-scoring member.
``DetectRelocalizationCandidates`` (``:239-369``) is the same scheme without
the minScore floor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig

GROUP_TOP_K = 10   # covisibility-group size (KeyFrameDatabase.cc:170)


class BowDatabase(NamedTuple):
    kf_word: jnp.ndarray    # (K, P) int32 word ids, -1 pad
    kf_wt: jnp.ndarray      # (K, P) float32 merged+normalized weights
    kf_valid: jnp.ndarray   # (K,) bool

    @property
    def K(self):
        return self.kf_word.shape[0]


def empty(cfg: SlamConfig) -> BowDatabase:
    K, P = cfg.map.max_kfs, cfg.map.max_kps
    return BowDatabase(
        kf_word=jnp.full((K, P), -1, jnp.int32),
        kf_wt=jnp.zeros((K, P), jnp.float32),
        kf_valid=jnp.zeros((K,), bool))


def add(db: BowDatabase, kf_id, word_id: jnp.ndarray, wt: jnp.ndarray,
        enable=True) -> BowDatabase:
    """Insert/overwrite a keyframe row (``KeyFrameDatabase::add``,
    ``KeyFrameDatabase.cc:37-47``). Predicated: with enable=False the write
    is redirected to the existing row content."""
    k = jnp.clip(kf_id, 0, db.K - 1)
    en = jnp.asarray(enable)
    return BowDatabase(
        kf_word=db.kf_word.at[k].set(jnp.where(en, word_id, db.kf_word[k])),
        kf_wt=db.kf_wt.at[k].set(jnp.where(en, wt, db.kf_wt[k])),
        kf_valid=db.kf_valid.at[k].set(en | db.kf_valid[k]))


def erase(db: BowDatabase, kf_id) -> BowDatabase:
    return db._replace(kf_valid=db.kf_valid.at[kf_id].set(False))


def query(db: BowDatabase, q_word: jnp.ndarray, q_wt: jnp.ndarray,
          num_words: int):
    """Score the query BoW against every keyframe row.

    Returns (scores (K,) float32 L1 scores, common (K,) int32 shared distinct
    words). One dense scatter + one (K, P) gather; the L1 score identity
    ``1 - 0.5|v-w|_1 = sum_i min(v_i, w_i)`` is from place/vocabulary.py.
    """
    ok = q_word >= 0
    tgt = jnp.where(ok, q_word, num_words)
    dense = jnp.zeros((num_words + 1,), jnp.float32).at[tgt].add(
        jnp.where(ok, q_wt, 0.0))
    present = jnp.zeros((num_words + 1,), bool).at[tgt].set(ok)

    kw = jnp.clip(db.kf_word, 0)
    has = (db.kf_word >= 0) & (db.kf_wt > 0)          # merged: one slot/word
    qv = jnp.where(has, dense[kw], 0.0)               # (K, P)
    scores = jnp.sum(jnp.minimum(db.kf_wt, qv), axis=1)
    common = jnp.sum((has & present[kw]).astype(jnp.int32), axis=1)
    scores = jnp.where(db.kf_valid, scores, 0.0)
    common = jnp.where(db.kf_valid, common, 0)
    return scores, common


def detect_candidates(db: BowDatabase, q_word, q_wt, exclude: jnp.ndarray,
                      covis: jnp.ndarray, num_words: int,
                      min_score: float = None):
    """Loop / relocalization candidates.

    exclude: (K,) bool — the query's covisible set + itself for loops
    (``KeyFrameDatabase.cc:96-107``), empty for relocalization.
    covis: (K, K) int32 covisibility weights (map_state.covisibility).
    min_score: BoW floor for loops (None for relocalization).
    Returns (K,) bool candidate mask.
    """
    scores, common = query(db, q_word, q_wt, num_words)
    share = db.kf_valid & (common > 0) & ~exclude
    max_common = jnp.max(jnp.where(share, common, 0))
    cand = share & (common > 0.8 * max_common.astype(jnp.float32))
    if min_score is not None:
        cand = cand & (scores >= min_score)

    K = scores.shape[0]
    w_top, idx_top = jax.lax.top_k(covis, GROUP_TOP_K)
    member_ok = (w_top > 0) & cand[idx_top]
    member_sc = jnp.where(member_ok, scores[idx_top], 0.0)
    acc = jnp.where(cand, scores + jnp.sum(member_sc, axis=1), 0.0)

    lead_sc = jnp.max(jnp.where(member_ok, member_sc, -1.0), axis=1)
    lead_arg = jnp.argmax(jnp.where(member_ok, member_sc, -1.0), axis=1)
    lead = jnp.where(lead_sc > scores,
                     idx_top[jnp.arange(K), lead_arg], jnp.arange(K))

    best_acc = jnp.max(acc)
    keep_group = cand & (acc > 0.75 * best_acc) & (best_acc > 0)
    # max-scatter so a False write never clobbers another group's leader
    out = jnp.zeros((K,), bool).at[lead].max(keep_group)
    # group leaders are themselves sharing keyframes; never return excluded
    return out & ~exclude & db.kf_valid
