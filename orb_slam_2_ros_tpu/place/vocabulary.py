"""Bag-of-words vocabulary: a k-ary descriptor tree as dense device arrays.

TPU-native equivalent of DBoW2's ``TemplatedVocabulary`` (SURVEY.md §2.23,
``Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h``): the reference walks a
pointer tree per descriptor (``transform``, ``TemplatedVocabulary.h:1140-1233``)
to produce a sparse ``BowVector`` (word -> tf-idf) and a ``FeatureVector``
(node at L-levelsup -> feature indices, used to gate matching). Here the tree
is ``levels`` flat arrays of node descriptors; ``transform`` is ``levels``
batched gather + Hamming-argmin steps over ALL keypoints of a frame at once —
a few masked vector ops instead of ~1200 sequential tree walks.

Training (``create`` in DBoW2) is hierarchical k-medians over binary
descriptors with bitwise-majority centroids, run once on the host (numpy) and
frozen to arrays. The ORBvoc binary format written by the reference
(``TemplatedVocabulary.h:1473-1578``: k, L, scoring, weighting header then
per-node parent/isLeaf/32-byte-descriptor/weight records) remains loadable
for parity via ``load_orbvoc_binary``.

Scoring is DBoW2's L1 metric (``ScoringObject.cpp``): for L1-normalized
non-negative vectors, ``1 - 0.5*|v-w|_1  ==  sum_i min(v_i, w_i)`` — the form
used by the database's one-pass gather scoring.
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.ops.hamming import hamming_matrix


class Vocabulary(NamedTuple):
    """Static-shape vocabulary tree.

    Level ``l`` (1-based, root excluded) holds ``k**l`` nodes; the children of
    node ``i`` at level ``l`` are nodes ``i*k .. i*k+k-1`` at level ``l+1``.
    ``node_desc`` concatenates the levels; ``level_offset[l-1]`` is the start
    of level ``l``. Leaves of level ``levels`` are the words.
    """

    node_desc: jnp.ndarray     # (n_nodes, 8) uint32
    word_weight: jnp.ndarray   # (k**levels,) float32 idf
    k: int
    levels: int
    levels_up: int             # FeatureVector grouping level distance

    @property
    def num_words(self) -> int:
        return self.k ** self.levels

    @property
    def level_offsets(self) -> Tuple[int, ...]:
        offs, acc = [], 0
        for l in range(1, self.levels + 1):
            offs.append(acc)
            acc += self.k ** l
        return tuple(offs)


# --------------------------------------------------------------------- train

def _unpack_bits(desc_u32: np.ndarray) -> np.ndarray:
    """(N, 8) uint32 -> (N, 256) uint8 bits."""
    as_u8 = desc_u32.astype("<u4").view(np.uint8).reshape(desc_u32.shape[0], 32)
    return np.unpackbits(as_u8, axis=1, bitorder="little")


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(N, 256) bits -> (N, 8) uint32."""
    u8 = np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")
    return u8.view("<u4").astype(np.uint32)


def _hamming_np(a_bits: np.ndarray, b_bits: np.ndarray) -> np.ndarray:
    """(N, 256) x (M, 256) -> (N, M) int32 via one matmul-shaped xor-sum."""
    # bits are 0/1; |a xor b| = a + b - 2ab summed over the bit axis
    ab = a_bits.astype(np.int32) @ b_bits.astype(np.int32).T
    return (a_bits.sum(1, dtype=np.int32)[:, None]
            + b_bits.sum(1, dtype=np.int32)[None, :] - 2 * ab)


def _kmedians(bits: np.ndarray, k: int, rng: np.random.Generator,
              iters: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Binary k-medians: majority-bit centroids (DBoW2 ``HKmeansStep``
    analog). Returns (centers (k, 256), assignment (N,))."""
    n = bits.shape[0]
    if n == 0:
        centers = rng.integers(0, 2, (k, bits.shape[1]), dtype=np.uint8)
        return centers, np.zeros((0,), np.int64)
    init = rng.choice(n, size=min(k, n), replace=False)
    centers = bits[init]
    if centers.shape[0] < k:   # duplicate-pad tiny nodes
        pad = centers[rng.integers(0, centers.shape[0], k - centers.shape[0])]
        centers = np.concatenate([centers, pad], axis=0)
    assign = np.zeros((n,), np.int64)
    for _ in range(iters):
        assign = _hamming_np(bits, centers).argmin(1)
        for j in range(k):
            sel = bits[assign == j]
            if sel.shape[0]:
                centers[j] = (sel.mean(0) > 0.5).astype(np.uint8)
    assign = _hamming_np(bits, centers).argmin(1)
    return centers, assign


def train_vocabulary(descriptors: np.ndarray, cfg: SlamConfig,
                     seed: int = 0) -> Vocabulary:
    """Hierarchical k-medians training (DBoW2 ``create``). descriptors:
    (N, 8) uint32. idf weights follow DBoW2 TF_IDF: ``log(N / N_i)`` with
    N_i = training features landing in word i (``TemplatedVocabulary.h``
    ``setNodeWeights``)."""
    k, L = cfg.vocab.k, cfg.vocab.levels
    rng = np.random.default_rng(seed)
    bits = _unpack_bits(np.asarray(descriptors, np.uint32))
    n = bits.shape[0]

    level_descs = []
    groups = [np.arange(n)]            # member indices per node of prev level
    for l in range(1, L + 1):
        descs_l = np.zeros((k ** l, 256), np.uint8)
        next_groups = []
        for i, g in enumerate(groups):
            centers, assign = _kmedians(bits[g], k, rng)
            descs_l[i * k:(i + 1) * k] = centers
            for j in range(k):
                next_groups.append(g[assign == j] if g.size else g)
        level_descs.append(_pack_bits(descs_l))
        groups = next_groups

    counts = np.array([g.size for g in groups], np.float64)
    weights = np.log(max(n, 1) / np.maximum(counts, 1.0))
    weights[counts == 0] = 0.0

    return Vocabulary(
        node_desc=jnp.asarray(np.concatenate(level_descs, axis=0)),
        word_weight=jnp.asarray(weights, jnp.float32),
        k=k, levels=L, levels_up=cfg.vocab.levels_up)


# ----------------------------------------------------------------- transform

def transform(vocab: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """Descend all descriptors through the tree at once.

    desc: (P, 8) uint32, valid: (P,) bool.
    Returns (word_id (P,) int32 [-1 invalid], node_id (P,) int32 the
    FeatureVector grouping node at level ``levels - levels_up``, tf_idf (P,)
    float32 un-normalized word weights).

    Replaces ``TemplatedVocabulary::transform``
    (``TemplatedVocabulary.h:1140-1233``): per level, gather the k candidate
    child descriptors of each keypoint's current node and take the Hamming
    argmin — (P, k) distances per level instead of a pointer walk.
    """
    P = desc.shape[0]
    k = vocab.k
    offsets = vocab.level_offsets
    idx = jnp.zeros((P,), jnp.int32)       # node index within current level
    node_id = jnp.zeros((P,), jnp.int32)
    for l in range(1, vocab.levels + 1):
        child_rows = offsets[l - 1] + idx[:, None] * k + jnp.arange(k)[None, :]
        cand = vocab.node_desc[child_rows]               # (P, k, 8)
        x = desc[:, None, :] ^ cand
        # inline popcount (ops.hamming.popcount_u32 over the (P, k, 8) tile)
        v = x - ((x >> 1) & jnp.uint32(0x55555555))
        v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
        v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
        d = jnp.sum(((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32), -1)
        best = jnp.argmin(d, axis=1).astype(jnp.int32)
        idx = idx * k + best
        if l == vocab.levels - vocab.levels_up:
            node_id = idx
    word_id = jnp.where(valid, idx, -1)
    node_id = jnp.where(valid, node_id, -1)
    tf_idf = jnp.where(valid, vocab.word_weight[jnp.clip(word_id, 0)], 0.0)
    return word_id, node_id, tf_idf


def bow_weights(word_id: jnp.ndarray, tf_idf: jnp.ndarray, num_words: int):
    """Merge duplicate words and L1-normalize, keeping the sparse (per-
    keypoint) layout: weight lands on the FIRST keypoint of each word, later
    duplicates get 0 (the BowVector accumulation of
    ``TemplatedVocabulary.h:1195-1201``).

    Returns (P,) float32 weights aligned with word_id; sum == 1 (or 0 if
    no valid words)."""
    P = word_id.shape[0]
    ok = word_id >= 0
    tgt = jnp.where(ok, word_id, num_words)
    dense = jnp.zeros((num_words + 1,), jnp.float32).at[tgt].add(
        jnp.where(ok, tf_idf, 0.0))
    first = jnp.full((num_words + 1,), P, jnp.int32).at[tgt].min(
        jnp.where(ok, jnp.arange(P, dtype=jnp.int32), P))
    is_first = ok & (first[tgt] == jnp.arange(P, dtype=jnp.int32))
    w = jnp.where(is_first, dense[tgt], 0.0)
    total = jnp.sum(w)
    return jnp.where(total > 0, w / jnp.maximum(total, 1e-12), 0.0)


def l1_score(word_a, w_a, word_b, w_b, num_words: int):
    """DBoW2 L1 score between two sparse BoW rows: sum_i min(a_i, b_i)
    (``ScoringObject.cpp`` L1Scoring; see module docstring for the identity).
    Inputs are (P,) word ids (-1 pad) and merged, normalized weights."""
    dense_b = jnp.zeros((num_words + 1,), jnp.float32).at[
        jnp.where(word_b >= 0, word_b, num_words)].add(w_b)
    gb = dense_b[jnp.clip(word_a, 0)]
    return jnp.sum(jnp.where(word_a >= 0, jnp.minimum(w_a, gb), 0.0))


# ------------------------------------------------------------ ORBvoc binary

def _parse_bin_py(path: str):
    """Pure-Python fallback parser for the binary format (used when the
    native loader, orb_slam_2_ros_tpu/native, is unavailable)."""
    with open(path, "rb") as f:
        header = f.read(16)
        k, L, _scoring, _weighting = struct.unpack("<iiii", header)
        raw = f.read()
    rec = struct.Struct("<i?32sd")
    n_nodes = len(raw) // rec.size
    # vectorized unpack: the packed record is 45 bytes
    arr = np.frombuffer(raw[:n_nodes * rec.size], np.uint8).reshape(
        n_nodes, rec.size)
    parents = arr[:, :4].copy().view("<i4")[:, 0]
    is_leaf = arr[:, 4].astype(bool)
    descs = arr[:, 5:37].copy()
    weights = arr[:, 37:45].copy().view("<f8")[:, 0]
    return k, L, parents.astype(np.int32), is_leaf, descs, weights


def load_orbvoc(path: str, cfg: SlamConfig,
                auto_convert: bool = True) -> Vocabulary:
    """Load a DBoW2 vocabulary (binary ``.bin`` fast path or text ``.txt``),
    replicating ``System.cc:68-88``: a text vocabulary is parsed once and
    re-saved next to it in the binary format so later startups take the
    fast path (``README.md:12``). Parsing uses the native C++ reader when
    available (orb_slam_2_ros_tpu/native), else Python."""
    from orb_slam_2_ros_tpu import native
    parsed = native.parse_orbvoc(path)
    if parsed is None:
        if path.endswith(".txt"):
            raise RuntimeError(
                "text vocabulary parsing requires the native loader "
                "(make -C orb_slam_2_ros_tpu/native)")
        parsed = _parse_bin_py(path)
    k, L, parents, is_leaf, descs, weights = parsed
    if path.endswith(".txt") and auto_convert:
        native.write_orbvoc_bin(path[:-4] + ".bin", k, L, parents, is_leaf,
                                descs, weights)
    return _relayout(k, L, parents, descs, weights, cfg)


def load_orbvoc_binary(path: str, cfg: SlamConfig) -> Vocabulary:
    """Binary-format loader (``TemplatedVocabulary.h:1473-1546``: header
    ``k L scoring weighting`` then per non-root node ``parent(int32)
    isLeaf(u8) desc(32B) weight(double)``)."""
    parsed = None
    try:
        from orb_slam_2_ros_tpu import native
        parsed = native.parse_orbvoc(path)
    except Exception:
        parsed = None
    if parsed is None:
        parsed = _parse_bin_py(path)
    k, L, parents, is_leaf, descs, weights = parsed
    return _relayout(k, L, parents, descs, weights, cfg)


def _relayout(k, L, parents, descs, weights, cfg: SlamConfig) -> Vocabulary:
    """Re-lay the parent-linked node list into the dense level arrays used
    by ``transform``; nodes beyond a level's dense slot budget (DBoW2 trees
    can be ragged when clusters were small) keep their parent's descriptor
    so descent remains well-defined."""
    n_nodes = len(parents)

    # fast path: a COMPLETE tree written in breadth-first id order (every
    # level full, children contiguous) re-lays with pure array reshapes —
    # required at ORBvoc scale (k=10, L=6 ~ 1.1M nodes), where the general
    # ragged-tree walk below would spend minutes in Python dicts.
    sizes = [k ** l for l in range(1, L + 1)]
    if n_nodes == sum(sizes):
        starts = np.cumsum([0] + sizes)        # level l-1 starts at starts[l-1]
        ids = np.arange(1, n_nodes + 1)
        lvl = np.searchsorted(starts[1:], ids - 1, side="right")  # 0-based
        slot = (ids - 1) - starts[lvl]
        expect_parent = np.where(
            lvl == 0, 0, starts[np.maximum(lvl - 1, 0)] + slot // k + 1)
        if np.array_equal(parents[:n_nodes].astype(np.int64), expect_parent):
            node_desc = np.ascontiguousarray(descs[:n_nodes]).view(
                "<u4").astype(np.uint32).reshape(n_nodes, 8)
            return Vocabulary(
                node_desc=jnp.asarray(node_desc),
                word_weight=jnp.asarray(weights[starts[L - 1]:],
                                        jnp.float32),
                k=k, levels=L, levels_up=cfg.vocab.levels_up)

    # re-layout: BFS from the root. Record i holds node id i+1 (the root,
    # id 0, is not written; ``saveToBinFile`` starts at m_nodes[1]). Dense
    # slot of child j of dense node i: i*k+j.
    children = {}
    for i in range(n_nodes):
        children.setdefault(int(parents[i]), []).append(i + 1)   # node ids
    level_descs, level_weights = [], []
    # frontier entries: (node id, dense slot at this level)
    frontier = [(c, j) for j, c in enumerate(children.get(0, [])[:k])]
    for l in range(1, L + 1):
        n_l = k ** l
        d_l = np.zeros((n_l, 32), np.uint8)
        w_l = np.zeros((n_l,), np.float64)
        filled = np.zeros((n_l,), bool)
        nxt = []
        for nid, dense in frontier:
            d_l[dense] = descs[nid - 1]
            w_l[dense] = weights[nid - 1]
            filled[dense] = True
            for j, c in enumerate(children.get(nid, [])[:k]):
                nxt.append((c, dense * k + j))
        # ragged holes inherit the parent descriptor (keeps argmin valid)
        if l > 1 and level_descs:
            parent_d = np.repeat(level_descs[-1], k, axis=0)
            d_l[~filled] = parent_d[~filled]
        level_descs.append(d_l)
        level_weights.append(w_l)
        frontier = nxt

    node_desc = np.concatenate(
        [d.view("<u4").astype(np.uint32).reshape(d.shape[0], 8)
         for d in level_descs], axis=0)
    return Vocabulary(
        node_desc=jnp.asarray(node_desc),
        word_weight=jnp.asarray(level_weights[-1], jnp.float32),
        k=k, levels=L, levels_up=cfg.vocab.levels_up)


def save_npz(vocab: Vocabulary, path: str):
    np.savez_compressed(path, node_desc=np.asarray(vocab.node_desc),
                        word_weight=np.asarray(vocab.word_weight),
                        k=vocab.k, levels=vocab.levels,
                        levels_up=vocab.levels_up)


def load_npz(path: str) -> Vocabulary:
    d = np.load(path)
    return Vocabulary(node_desc=jnp.asarray(d["node_desc"]),
                      word_weight=jnp.asarray(d["word_weight"]),
                      k=int(d["k"]), levels=int(d["levels"]),
                      levels_up=int(d["levels_up"]))
