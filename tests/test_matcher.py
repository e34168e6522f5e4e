"""Matcher tests: popcount oracle, best-two reduction, conflict resolution,
rotation-consistency filter, and synthetic end-to-end projection matching."""

import jax.numpy as jnp
import numpy as np

from orb_slam_2_ros_tpu.config import SlamConfig, CameraConfig
from orb_slam_2_ros_tpu.frontend import matcher
from orb_slam_2_ros_tpu.frontend.extractor import Keypoints
from orb_slam_2_ros_tpu.frontend.frame import Frame
from orb_slam_2_ros_tpu.geometry import se3
from orb_slam_2_ros_tpu.ops import hamming

RNG = np.random.default_rng(11)


def rand_desc(n):
    return RNG.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def test_popcount_matches_numpy():
    a = rand_desc(64)
    b = rand_desc(32)
    D = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(0, 64, 7):
        for j in range(0, 32, 5):
            x = (a[i] ^ b[j]).view(np.uint8)
            assert D[i, j] == np.unpackbits(x).sum()


def test_best_two():
    D = jnp.asarray(np.array([[5, 3, 9], [7, 7, 1]], np.int32))
    mask = jnp.asarray(np.array([[True, True, True], [True, False, True]]))
    bi, bd, si, sd = hamming.best_two(D, mask)
    assert list(np.asarray(bi)) == [1, 2]
    assert list(np.asarray(bd)) == [3, 1]
    assert list(np.asarray(sd)) == [5, 7]
    # fully masked row
    bi, bd, _, sd = hamming.best_two(D, jnp.zeros_like(mask))
    assert np.all(np.asarray(bd) == hamming.INF_DIST)


def test_resolve_conflicts():
    best_kp = jnp.asarray(np.array([4, 4, 2], np.int32))
    best_d = jnp.asarray(np.array([10, 3, 7], np.int32))
    accept = jnp.asarray(np.array([True, True, True]))
    kp_to_q, kp_dist = matcher.resolve_conflicts(best_kp, best_d, accept, 6)
    out = np.asarray(kp_to_q)
    assert out[4] == 1 and out[2] == 2     # query 1 wins slot 4 (dist 3 < 10)
    assert (out[[0, 1, 3, 5]] == -1).all()
    assert np.asarray(kp_dist)[4] == 3


def test_rotation_consistency():
    # 90 matches at ~0 deg, 10 at scattered rotations
    rot = np.concatenate([RNG.normal(0, 2, 90), RNG.uniform(60, 300, 10)])
    accept = jnp.ones((100,), bool)
    keep = np.asarray(matcher.rotation_consistency(jnp.asarray(rot, jnp.float32), accept))
    assert keep[:90].all()
    assert keep[90:].sum() <= 3


def _mk_frame(cfg, uv, desc, octave=None, ur=None, angle=None):
    n = cfg.orb.max_kps
    m = uv.shape[0]
    pad = n - m
    uvp = np.pad(uv, ((0, pad), (0, 0))).astype(np.float32)
    descp = np.pad(desc, ((0, pad), (0, 0)))
    octp = np.pad(octave if octave is not None else np.zeros(m, np.int32), (0, pad))
    angp = np.pad(angle if angle is not None else np.zeros(m, np.float32), (0, pad))
    urp = np.pad(ur if ur is not None else -np.ones(m, np.float32), (0, pad),
                 constant_values=-1)
    valid = np.zeros(n, bool)
    valid[:m] = True
    kps = Keypoints(xy=jnp.asarray(uvp), response=jnp.asarray(valid, jnp.float32),
                    angle=jnp.asarray(angp), octave=jnp.asarray(octp, jnp.int32),
                    desc=jnp.asarray(descp), valid=jnp.asarray(valid))
    return Frame(kps=kps, uv=jnp.asarray(uvp), u_right=jnp.asarray(urp),
                 depth=jnp.full((n,), -1.0))


def test_search_local_map_synthetic():
    cfg = SlamConfig(camera=CameraConfig(), orb=SlamConfig().orb.__class__(max_kps=128))
    cam = cfg.camera
    n_mp = 60
    pts = np.stack([RNG.uniform(-1.5, 1.5, n_mp), RNG.uniform(-1, 1, n_mp),
                    RNG.uniform(2, 5, n_mp)], -1).astype(np.float32)
    q, t = se3.identity()
    uv = np.asarray(
        pts[:, :2] / pts[:, 2:3] * np.array([cam.fx, cam.fy]) + np.array([cam.cx, cam.cy]))
    desc = rand_desc(n_mp)
    frame = _mk_frame(cfg, uv, desc)
    dist = np.linalg.norm(pts, axis=-1)
    # scale band for octave-0 observations: max_dist ~= dist (MapPoint.cc:388-438)
    tv = matcher.frustum_check(
        q, t, jnp.asarray(pts),
        jnp.asarray(pts / dist[:, None]),
        jnp.asarray(0.5 * dist), jnp.asarray(1.05 * dist),
        jnp.ones((n_mp,), bool), cfg)
    assert np.asarray(tv.ok).all()
    kp_to_mp, _ = matcher.search_local_map(
        tv, jnp.asarray(desc), frame, jnp.zeros((128,), bool), cfg)
    out = np.asarray(kp_to_mp)
    # each of the first n_mp kps should match its own map point
    assert (out[:n_mp] == np.arange(n_mp)).mean() > 0.95
    assert (out[n_mp:] == -1).all()


def test_search_by_projection_pose_synthetic():
    cfg = SlamConfig()
    cam = cfg.camera
    n = 80
    pts = np.stack([RNG.uniform(-1.5, 1.5, n), RNG.uniform(-1, 1, n),
                    RNG.uniform(2, 5, n)], -1).astype(np.float32)
    desc = rand_desc(n)
    # current pose slightly moved; keypoints = projections under current pose
    q, t = se3.exp(jnp.asarray([0.05, 0.0, 0.01, 0.002, -0.004, 0.001]))
    xc = np.asarray(se3.apply(q, t, jnp.asarray(pts)))
    uv = xc[:, :2] / xc[:, 2:3] * np.array([cam.fx, cam.fy]) + np.array([cam.cx, cam.cy])
    inside = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
    frame = _mk_frame(cfg, uv, desc)
    kp_to_src, _ = matcher.search_by_projection_pose(
        jnp.asarray(pts), jnp.asarray(desc), jnp.zeros((n,), jnp.int32),
        jnp.ones((n,), bool), q, t, frame, cfg, th=15.0, check_rotation=False)
    out = np.asarray(kp_to_src)
    good = out[:n][inside] == np.arange(n)[inside]
    assert good.mean() > 0.95


def test_search_by_node():
    cfg = SlamConfig()
    n, m = 50, 50
    desc = rand_desc(n)
    nodes = RNG.integers(0, 10, n).astype(np.int32)
    perm = RNG.permutation(m)
    t_to_q, _ = matcher.search_by_node(
        jnp.asarray(desc), jnp.asarray(nodes), jnp.ones((n,), bool),
        jnp.zeros((n,), jnp.float32),
        jnp.asarray(desc[perm]), jnp.asarray(nodes[perm]), jnp.ones((m,), bool),
        jnp.zeros((m,), jnp.float32), cfg, check_rotation=False)
    out = np.asarray(t_to_q)
    assert (out == perm).mean() > 0.95
