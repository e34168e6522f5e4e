"""Place recognition tests: vocabulary tree, BoW scoring, candidate retrieval
(SURVEY.md §4: unit tests per kernel with known-answer oracles)."""

import os
import struct

import jax.numpy as jnp
import numpy as np

from orb_slam_2_ros_tpu.config import SlamConfig, VocabConfig
import dataclasses

from orb_slam_2_ros_tpu.place import database, vocabulary

RNG = np.random.default_rng(7)


def small_cfg():
    cfg = SlamConfig()
    return cfg.replace(vocab=VocabConfig(k=4, levels=3))   # 64 words


def rand_desc(n):
    return RNG.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def test_train_and_transform_roundtrip():
    cfg = small_cfg()
    train = rand_desc(2000)
    voc = vocabulary.train_vocabulary(train, cfg, seed=0)
    assert voc.num_words == 64
    assert voc.node_desc.shape == (4 + 16 + 64, 8)

    desc = jnp.asarray(train[:128])
    valid = jnp.ones((128,), bool)
    wid, nid, w = vocabulary.transform(voc, desc, valid)
    assert int(jnp.min(wid)) >= 0 and int(jnp.max(wid)) < 64
    # node_id is the level levels-levels_up ancestor: word // k^levels_up
    np.testing.assert_array_equal(
        np.asarray(nid), np.asarray(wid) // (voc.k ** voc.levels_up))
    # a training descriptor must land in a word whose leaf descriptor is
    # nearby (tree descent is greedy, so just sanity-check determinism)
    wid2, _, _ = vocabulary.transform(voc, desc, valid)
    np.testing.assert_array_equal(np.asarray(wid), np.asarray(wid2))
    # invalid keypoints get -1
    wid3, nid3, w3 = vocabulary.transform(voc, desc, jnp.zeros((128,), bool))
    assert int(jnp.max(wid3)) == -1 and float(jnp.max(w3)) == 0.0


def test_bow_weights_merge_and_normalize():
    # three kps in word 5, one in word 9: weights merge onto first occurrence
    wid = jnp.array([5, 9, 5, 5, -1], jnp.int32)
    tfidf = jnp.array([2.0, 1.0, 2.0, 2.0, 7.0], jnp.float32)
    w = vocabulary.bow_weights(wid, tfidf, num_words=16)
    w = np.asarray(w)
    assert abs(w.sum() - 1.0) < 1e-6
    assert w[0] > 0 and w[2] == 0 and w[3] == 0 and w[4] == 0
    assert abs(w[0] / w[1] - 6.0 / 1.0) < 1e-5


def test_l1_score_identity():
    wa = jnp.array([1, 2, 3, -1], jnp.int32)
    va = vocabulary.bow_weights(wa, jnp.array([1.0, 1.0, 2.0, 0.0]), 16)
    # self score == 1 for L1-normalized vectors
    assert abs(float(vocabulary.l1_score(wa, va, wa, va, 16)) - 1.0) < 1e-6
    wb = jnp.array([7, 8, -1, -1], jnp.int32)
    vb = vocabulary.bow_weights(wb, jnp.array([1.0, 1.0, 0.0, 0.0]), 16)
    assert float(vocabulary.l1_score(wa, va, wb, vb, 16)) == 0.0


def _bow_rows(cfg, voc, n_kf, n_kp=32):
    """Distinct random frames -> (word, weight) rows."""
    rows = []
    for _ in range(n_kf):
        d = jnp.asarray(rand_desc(n_kp))
        wid, _, tfidf = vocabulary.transform(voc, d, jnp.ones((n_kp,), bool))
        rows.append((wid, vocabulary.bow_weights(wid, tfidf, voc.num_words)))
    return rows


def test_database_query_ranks_self_highest():
    cfg = small_cfg()
    voc = vocabulary.train_vocabulary(rand_desc(2000), cfg, seed=0)
    db = database.empty(cfg)
    rows = _bow_rows(cfg, voc, 6)
    P = cfg.map.max_kps
    for i, (wid, wt) in enumerate(rows):
        pad_w = jnp.full((P,), -1, jnp.int32).at[:wid.shape[0]].set(wid)
        pad_v = jnp.zeros((P,), jnp.float32).at[:wt.shape[0]].set(wt)
        db = database.add(db, i, pad_w, pad_v)
    wid, wt = rows[2]
    pad_w = jnp.full((P,), -1, jnp.int32).at[:wid.shape[0]].set(wid)
    pad_v = jnp.zeros((P,), jnp.float32).at[:wt.shape[0]].set(wt)
    scores, common = database.query(db, pad_w, pad_v, voc.num_words)
    scores = np.asarray(scores)
    assert scores.argmax() == 2
    assert abs(scores[2] - 1.0) < 1e-5
    assert int(np.asarray(common)[2]) > 0


def test_detect_candidates_excludes_and_groups():
    cfg = small_cfg()
    voc = vocabulary.train_vocabulary(rand_desc(2000), cfg, seed=0)
    db = database.empty(cfg)
    K, P = cfg.map.max_kfs, cfg.map.max_kps
    base = rand_desc(32)

    def row_from(desc):
        wid, _, tfidf = vocabulary.transform(
            voc, jnp.asarray(desc), jnp.ones((desc.shape[0],), bool))
        wt = vocabulary.bow_weights(wid, tfidf, voc.num_words)
        pw = jnp.full((P,), -1, jnp.int32).at[:wid.shape[0]].set(wid)
        pv = jnp.zeros((P,), jnp.float32).at[:wt.shape[0]].set(wt)
        return pw, pv

    # KF 0..3: unrelated; KF 4: near-duplicate of the query (the loop)
    rows = []
    for i in range(4):
        rows.append(row_from(rand_desc(32)))
    dup = base.copy()
    dup[:4] = rand_desc(4)       # slight appearance change
    rows.append(row_from(dup))
    for i, (pw, pv) in enumerate(rows):
        db = database.add(db, i, pw, pv)

    qw, qv = row_from(base)
    covis = jnp.zeros((K, K), jnp.int32)
    exclude = jnp.zeros((K,), bool)
    cand = database.detect_candidates(db, qw, qv, exclude, covis,
                                      voc.num_words, min_score=0.01)
    cand = np.asarray(cand)
    assert cand[4], "the near-duplicate keyframe must be a loop candidate"
    # excluding the match suppresses it
    cand2 = database.detect_candidates(
        db, qw, qv, jnp.zeros((K,), bool).at[4].set(True), covis,
        voc.num_words, min_score=0.01)
    assert not np.asarray(cand2)[4]


def test_orbvoc_binary_loader():
    """Round-trip a tiny synthetic tree written in the reference's binary
    format (``TemplatedVocabulary.h:1549-1578``: header k,L,scoring,weighting
    int32; records = parent int32, isLeaf u8, 32-byte desc, weight double)."""
    import tempfile, os
    k, L = 2, 2
    # nodes: 1,2 (parents 0); 3,4 (parent 1); 5,6 (parent 2). leaves 3-6.
    # structured prototypes so greedy descent is unambiguous: branch 1 is
    # all-zero-ish, branch 2 all-one-ish, leaves differ by a couple of bits
    descs = np.zeros((7, 32), np.uint8)
    descs[2] = 0xFF
    descs[3, 0] = 0x01
    descs[4, 0] = 0x06
    descs[5] = 0xFF; descs[5, 0] = 0xFE
    descs[6] = 0xFF; descs[6, 0] = 0xF9
    recs = [
        (0, 0, descs[1], 0.0), (0, 0, descs[2], 0.0),
        (1, 1, descs[3], 0.5), (1, 1, descs[4], 0.6),
        (2, 1, descs[5], 0.7), (2, 1, descs[6], 0.8),
    ]
    fd, path = tempfile.mkstemp(suffix=".bin")
    with os.fdopen(fd, "wb") as f:
        f.write(struct.pack("<iiii", k, L, 0, 0))
        for parent, leaf, d, w in recs:
            f.write(struct.pack("<i", parent))
            f.write(struct.pack("<B", leaf))
            f.write(d.tobytes())
            f.write(struct.pack("<d", w))
    cfg = dataclasses.replace(SlamConfig(),
                              vocab=VocabConfig(k=2, levels=2, levels_up=1))
    voc = vocabulary.load_orbvoc_binary(path, cfg)
    os.unlink(path)
    assert voc.k == 2 and voc.levels == 2 and voc.num_words == 4
    np.testing.assert_allclose(np.asarray(voc.word_weight),
                               [0.5, 0.6, 0.7, 0.8])
    # each leaf descriptor must map to its own word
    leaf_desc = jnp.asarray(
        descs[3:7].reshape(4, 32).view("<u4").astype(np.uint32))
    wid, _, _ = vocabulary.transform(voc, leaf_desc, jnp.ones((4,), bool))
    np.testing.assert_array_equal(np.asarray(wid), [0, 1, 2, 3])


def _write_tiny_bin(path, descs, recs):
    with open(path, "wb") as f:
        f.write(struct.pack("<iiii", 2, 2, 0, 0))
        for parent, leaf, d, w in recs:
            f.write(struct.pack("<i", parent))
            f.write(struct.pack("<B", leaf))
            f.write(d.tobytes())
            f.write(struct.pack("<d", w))


def test_native_vocab_loader_parity(tmp_path):
    """Native C++ parser must agree with the Python fallback, and the text
    path must auto-convert to binary (System.cc:68-88 behavior)."""
    from orb_slam_2_ros_tpu import native
    from orb_slam_2_ros_tpu.place.vocabulary import _parse_bin_py

    descs = np.zeros((7, 32), np.uint8)
    descs[2] = 0xFF
    descs[3, 0] = 0x01
    descs[4, 0] = 0x06
    descs[5] = 0xFF; descs[5, 0] = 0xFE
    descs[6] = 0xFF; descs[6, 0] = 0xF9
    recs = [
        (0, 0, descs[1], 0.0), (0, 0, descs[2], 0.0),
        (1, 1, descs[3], 0.5), (1, 1, descs[4], 0.6),
        (2, 1, descs[5], 0.7), (2, 1, descs[6], 0.8),
    ]
    p = str(tmp_path / "voc.bin")
    _write_tiny_bin(p, descs, recs)

    py = _parse_bin_py(p)
    nat = native.parse_orbvoc(p)
    if nat is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # text round trip: write text, load (auto-converts), compare transform
    pt = str(tmp_path / "voc.txt")
    with open(pt, "w") as f:
        f.write("2 2 0 0\n")
        for parent, leaf, d, w in recs:
            f.write(f"{parent} {leaf} " + " ".join(str(int(v)) for v in d)
                    + f" {w}\n")
    cfg = dataclasses.replace(SlamConfig(),
                              vocab=VocabConfig(k=2, levels=2, levels_up=1))
    voc_txt = vocabulary.load_orbvoc(pt, cfg)
    assert os.path.exists(pt[:-4] + ".bin"), "text->bin auto-convert missing"
    voc_bin = vocabulary.load_orbvoc(pt[:-4] + ".bin", cfg)
    np.testing.assert_array_equal(np.asarray(voc_txt.node_desc),
                                  np.asarray(voc_bin.node_desc))
    np.testing.assert_allclose(np.asarray(voc_txt.word_weight),
                               [0.5, 0.6, 0.7, 0.8])


def test_retrieval_precision_at_scale():
    """Retrieval-grade precision of the default 10^4-word tree at 120
    keyframes (round-3 VERDICT weak 5): two laps over 60 distinct places,
    each keyframe observing its place's descriptors under ~3% bit noise.
    Second-lap queries must rank a first-lap keyframe of the SAME place
    first for >= 90% of queries (the property loop detection and
    relocalization stand on: ``KeyFrameDatabase::DetectLoopCandidates``)."""
    import dataclasses
    from orb_slam_2_ros_tpu.config import SlamConfig
    from orb_slam_2_ros_tpu.place import database

    rng = np.random.default_rng(11)
    n_places, n_laps, n_desc = 60, 2, 48
    base = rng.integers(0, 2 ** 32, (n_places, n_desc, 8), dtype=np.uint32)

    def observe(p):
        d = base[p].copy()
        # flip ~8 of 256 bits per descriptor
        for j in range(n_desc):
            for b in rng.choice(256, 8, replace=False):
                d[j, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
        return d

    kfs = [observe(i % n_places) for i in range(n_places * n_laps)]
    cfg = SlamConfig()                      # default vocab: k=10, L=4
    voc = vocabulary.train_vocabulary(
        np.concatenate(kfs[:n_places]), cfg, seed=0)
    assert voc.num_words >= 5000            # the 10^4-word class tree

    K = n_places * n_laps
    cfg = dataclasses.replace(
        cfg, map=dataclasses.replace(cfg.map, max_kfs=K, max_kps=n_desc))
    db = database.empty(cfg)
    rows = []
    for i, d in enumerate(kfs):
        wid, _, tfidf = vocabulary.transform(
            voc, jnp.asarray(d), jnp.ones((n_desc,), bool))
        wt = vocabulary.bow_weights(wid, tfidf, voc.num_words)
        rows.append((wid, wt))
        db = database.add(db, jnp.int32(i), wid, wt, enable=jnp.array(True))

    hits = 0
    for i in range(n_places, K):
        wid, wt = rows[i]
        scores, _ = database.query(db, wid, wt, voc.num_words)
        scores = np.array(scores)            # writable copy
        scores[max(0, i - 10):] = -np.inf    # exclude self + recent lap tail
        top = int(np.argmax(scores))
        if top % n_places == i % n_places:
            hits += 1
    precision = hits / n_places
    assert precision >= 0.9, precision
