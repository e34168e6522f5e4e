"""Pallas fused matcher kernel vs the JAX masked best-two oracle
(interpret mode on the CPU suite; compiled on TPU via the bench)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.ops import hamming, pallas_match


def make_case(N=256, M=640, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32)
    row_meta = np.zeros((8, N), np.float32)
    row_meta[0] = rng.uniform(0, 640, N)
    row_meta[1] = rng.uniform(0, 480, N)
    row_meta[2] = rng.uniform(30, 300, N)
    row_meta[3] = rng.integers(-1, 2, N)
    row_meta[4] = rng.integers(3, 8, N)
    row_meta[5] = np.where(rng.uniform(0, 1, N) < 0.5, -1.0,
                           rng.uniform(0, 640, N))
    row_meta[6] = rng.uniform(0, 1, N) > 0.15
    col_meta = np.zeros((8, M), np.float32)
    col_meta[0] = rng.uniform(0, 640, M)
    col_meta[1] = rng.uniform(0, 480, M)
    col_meta[2] = rng.integers(0, 8, M)
    col_meta[3] = np.where(rng.uniform(0, 1, M) < 0.5, -1.0,
                           rng.uniform(0, 640, M))
    col_meta[4] = rng.uniform(0, 1, M) > 0.15
    return a, b, row_meta, col_meta


def oracle(a, b, row_meta, col_meta):
    D = np.asarray(hamming.hamming_matrix_popcount(jnp.asarray(a),
                                                   jnp.asarray(b)))
    ru, rv, rr = row_meta[0][:, None], row_meta[1][:, None], row_meta[2][:, None]
    rlo, rhi, rur = row_meta[3][:, None], row_meta[4][:, None], row_meta[5][:, None]
    rok = row_meta[6][:, None] > 0
    cu, cv, co = col_meta[0][None], col_meta[1][None], col_meta[2][None]
    cur, cok = col_meta[3][None], col_meta[4][None] > 0
    ok = (rok & cok & (np.abs(ru - cu) <= rr) & (np.abs(rv - cv) <= rr)
          & (co >= rlo) & (co <= rhi)
          & ((cur <= 0) | (np.abs(rur - cur) <= rr)))
    BIG = 1 << 20
    Dm = np.where(ok, D, BIG)
    b1 = Dm.min(1)
    i1 = Dm.argmin(1)
    D2 = Dm.copy()
    D2[np.arange(D.shape[0]), i1] = BIG
    b2 = D2.min(1)
    return D, b1, i1, b2


def test_pallas_matches_oracle_interpret():
    a, b, row_meta, col_meta = make_case()
    bi, bd, si, sd = pallas_match.masked_best_two(
        hamming.unpack_pm1(jnp.asarray(a)), jnp.asarray(row_meta),
        hamming.unpack_pm1(jnp.asarray(b)), jnp.asarray(col_meta),
        interpret=True)
    D, b1, i1, b2 = oracle(a, b, row_meta, col_meta)
    has = b1 < (1 << 20)
    np.testing.assert_array_equal(np.asarray(bd)[has], b1[has])
    # argmin may differ between equal-distance candidates; distances match
    np.testing.assert_array_equal(
        D[np.arange(D.shape[0]), np.asarray(bi)][has], b1[has])
    has2 = has & (b2 < (1 << 20))
    np.testing.assert_array_equal(np.asarray(sd)[has2], b2[has2])
    # no-candidate rows report a huge distance
    assert (np.asarray(bd)[~has] > 1000).all()


def test_matcher_fused_path_matches_jax(monkeypatch):
    """Force the fused path in interpret mode and compare the full
    search_local_map outputs against the pure-JAX path."""
    from orb_slam_2_ros_tpu.frontend import matcher
    from orb_slam_2_ros_tpu.frontend.frame import Frame
    from orb_slam_2_ros_tpu.frontend.extractor import Keypoints
    from orb_slam_2_ros_tpu.config import MapConfig, OrbConfig, SlamConfig

    cfg = SlamConfig(orb=OrbConfig(n_features=256, max_kps=256),
                     map=MapConfig(max_kfs=8, max_mps=512, max_kps=256))
    rng = np.random.default_rng(3)
    P, NM = 256, 512
    kps = Keypoints(
        xy=jnp.asarray(rng.uniform(0, 320, (P, 2)), jnp.float32),
        response=jnp.zeros((P,)),
        angle=jnp.asarray(rng.uniform(-3, 3, P), jnp.float32),
        octave=jnp.asarray(rng.integers(0, 8, P), jnp.int32),
        desc=jnp.asarray(rng.integers(0, 2 ** 32, (P, 8), dtype=np.uint32)),
        valid=jnp.asarray(rng.uniform(0, 1, P) > 0.1))
    frame = Frame(kps=kps, uv=kps.xy,
                  u_right=jnp.full((P,), -1.0), depth=jnp.full((P,), -1.0))
    tv = matcher.TrackInView(
        uv=jnp.asarray(rng.uniform(0, 320, (NM, 2)), jnp.float32),
        u_right=jnp.full((NM,), -1.0),
        dist=jnp.ones((NM,)),
        view_cos=jnp.ones((NM,)),
        pred_level=jnp.asarray(rng.integers(0, 8, NM), jnp.int32),
        ok=jnp.asarray(rng.uniform(0, 1, NM) > 0.2))
    mp_desc = jnp.asarray(rng.integers(0, 2 ** 32, (NM, 8), dtype=np.uint32))
    kp_has = jnp.asarray(rng.uniform(0, 1, P) > 0.8)

    ref = matcher.search_local_map(tv, mp_desc, frame, kp_has, cfg, th=3.0)

    monkeypatch.setattr(matcher, "_pallas_ok", lambda n, m: True)
    orig = matcher._fused_best_two
    monkeypatch.setattr(matcher, "_fused_best_two",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    fused = matcher.search_local_map(tv, mp_desc, frame, kp_has, cfg, th=3.0)

    # matched sets agree (ties in hamming distance may pick either index;
    # compare the kp->mp distance outcome)
    np.testing.assert_array_equal(np.asarray(ref[1]) < 100,
                                  np.asarray(fused[1]) < 100)
    both = (np.asarray(ref[0]) >= 0) & (np.asarray(fused[0]) >= 0)
    np.testing.assert_array_equal(np.asarray(ref[1])[both],
                                  np.asarray(fused[1])[both])
