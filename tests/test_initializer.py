"""Monocular two-view initializer tests on synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import se3, camera
from orb_slam_2_ros_tpu.solvers import initializer

def make_two_view(n=150, planar=False, noise=0.3, outlier_frac=0.0, seed=41):
    # fresh generator per call: test data must not depend on execution order
    RNG = np.random.default_rng(seed)
    cfg = SlamConfig()
    cam = cfg.camera
    K = np.asarray(camera.intrinsics(cam))
    if planar:
        # points on a plane z = 4 + 0.1x
        x = RNG.uniform(-2, 2, n)
        y = RNG.uniform(-1.5, 1.5, n)
        z = 4.0 + 0.1 * x
        pts = np.stack([x, y, z], -1).astype(np.float32)
    else:
        pts = np.stack([RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
                        RNG.uniform(3, 8, n)], -1).astype(np.float32)
    xi = np.array([0.25, 0.03, 0.05, 0.02, -0.06, 0.01], np.float32)
    q2, t2 = se3.exp(jnp.asarray(xi))
    uv1 = np.asarray(camera.project(cam, jnp.asarray(pts)))
    uv2 = np.asarray(camera.project(cam, se3.apply(q2, t2, jnp.asarray(pts))))
    uv1 = uv1 + RNG.normal(0, noise, uv1.shape)
    uv2 = uv2 + RNG.normal(0, noise, uv2.shape)
    if outlier_frac:
        k = int(outlier_frac * n)
        idx = RNG.choice(n, k, replace=False)
        uv2[idx] += RNG.uniform(30, 120, (k, 2)) * RNG.choice([-1, 1], (k, 2))
    valid = ((uv1 > 5) & (uv1 < [635, 475])).all(-1) & \
            ((uv2 > 5) & (uv2 < [635, 475])).all(-1)
    return (jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.asarray(valid), jnp.asarray(K, jnp.float32), (q2, t2), pts)


def rel_pose_err(q, t, q_true, t_true):
    # translation only up to scale: compare directions
    ang = np.degrees(np.arccos(np.clip(abs(float(
        jnp.dot(t / jnp.linalg.norm(t), t_true / jnp.linalg.norm(t_true)))), 0, 1)))
    dq = se3.quat_mul(se3.quat_conj(q), q_true)
    rot = np.degrees(2 * np.arccos(np.clip(abs(float(dq[0])), 0, 1)))
    return rot, ang


def _run(uv1, uv2, valid, K):
    fn = jax.jit(lambda *a: initializer.initialize(*a, jax.random.PRNGKey(0)))
    return fn(uv1, uv2, valid, K)


def test_init_general_scene():
    uv1, uv2, valid, K, (q2, t2), pts = make_two_view()
    res = _run(uv1, uv2, valid, K)
    assert bool(res.ok)
    assert not bool(res.used_h)          # general scene -> fundamental
    rot, ang = rel_pose_err(res.q, res.t, q2, t2)
    assert rot < 0.5 and ang < 2.0, (rot, ang)
    # triangulated points match ground truth up to the global scale
    g = np.asarray(res.good)
    scale = np.median(np.asarray(res.points)[g][:, 2] / pts[g][:, 2])
    err = np.abs(np.asarray(res.points)[g] / scale - pts[g])
    assert np.median(err) < 0.05


def test_init_planar_scene_uses_homography():
    uv1, uv2, valid, K, (q2, t2), pts = make_two_view(planar=True)
    res = _run(uv1, uv2, valid, K)
    assert bool(res.used_h)
    assert bool(res.ok)
    rot, ang = rel_pose_err(res.q, res.t, q2, t2)
    # planar t-direction is noise-limited (an f64 all-point DLT oracle gets
    # 1.5 deg on this scene at 0.3 px noise)
    assert rot < 0.5 and ang < 3.0, (rot, ang)


def test_init_with_outliers():
    uv1, uv2, valid, K, (q2, t2), pts = make_two_view(outlier_frac=0.2)
    res = _run(uv1, uv2, valid, K)
    assert bool(res.ok)
    rot, ang = rel_pose_err(res.q, res.t, q2, t2)
    # outer refit->rescore rounds push even the contaminated case near the
    # noise floor; full BA right after init tightens further
    assert rot < 0.5 and ang < 5.0, (rot, ang)


def test_init_rejects_no_parallax():
    """Pure rotation (no baseline) must not produce a confident init."""
    RNG = np.random.default_rng(43)
    cfg = SlamConfig()
    cam = cfg.camera
    K = np.asarray(camera.intrinsics(cam))
    pts = np.stack([RNG.uniform(-2, 2, 150), RNG.uniform(-1.5, 1.5, 150),
                    RNG.uniform(3, 8, 150)], -1).astype(np.float32)
    q2, _ = se3.exp(jnp.asarray([0.0, 0, 0, 0.02, -0.04, 0.01]))
    t2 = jnp.zeros(3)
    uv1 = np.asarray(camera.project(cam, jnp.asarray(pts)))
    uv2 = np.asarray(camera.project(cam, se3.apply(q2, t2, jnp.asarray(pts))))
    uv1 = uv1 + RNG.normal(0, 0.3, uv1.shape)
    uv2 = uv2 + RNG.normal(0, 0.3, uv2.shape)
    valid = np.ones(150, bool)
    res = _run(jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
               jnp.asarray(valid), jnp.asarray(K, jnp.float32))
    assert not bool(res.ok)
