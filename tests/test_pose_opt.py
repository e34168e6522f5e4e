"""Pose-only LM tests on synthetic geometry with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import se3, camera
from orb_slam_2_ros_tpu.solvers.pose_opt import pose_optimization

RNG = np.random.default_rng(23)


def make_problem(n=200, noise=0.3, outlier_frac=0.0, stereo=False):
    cfg = SlamConfig()
    cam = cfg.camera
    pts = np.stack([RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
                    RNG.uniform(2, 8, n)], -1).astype(np.float32)
    xi_true = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.015], np.float32)
    q_true, t_true = se3.exp(jnp.asarray(xi_true))
    xc = se3.apply(q_true, t_true, jnp.asarray(pts))
    uvr = np.asarray(camera.project_stereo(cam, xc))
    obs_uv = uvr[:, :2] + RNG.normal(0, noise, (n, 2)).astype(np.float32)
    if stereo:
        obs_ur = uvr[:, 2] + RNG.normal(0, noise, n).astype(np.float32)
    else:
        obs_ur = -np.ones(n, np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = RNG.choice(n, n_out, replace=False)
        obs_uv[idx] += RNG.uniform(15, 60, (n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))
    octave = RNG.integers(0, 4, n).astype(np.int32)
    return cfg, pts, obs_uv, obs_ur, octave, (q_true, t_true), (idx if n_out else None)


def _solve(cfg, pts, obs_uv, obs_ur, octave, q0=None, t0=None):
    if q0 is None:
        q0, t0 = se3.identity()
    fn = jax.jit(lambda *a: pose_optimization(*a, cfg=cfg))
    return fn(q0, t0, jnp.asarray(pts), jnp.asarray(obs_uv), jnp.asarray(obs_ur),
              jnp.asarray(octave), jnp.ones((pts.shape[0],), bool))


def pose_err(q, t, q_true, t_true):
    dq, dt = se3.relative(q, t, q_true, t_true)
    return float(jnp.linalg.norm(se3.log(dq, dt)))


def test_pose_opt_clean_mono():
    cfg, pts, obs_uv, obs_ur, octv, (qt, tt), _ = make_problem(noise=0.2)
    q, t, inlier, n_in = _solve(cfg, pts, obs_uv, obs_ur, octv)
    assert pose_err(q, t, qt, tt) < 2e-3
    assert int(n_in) > 180


def test_pose_opt_clean_stereo():
    cfg, pts, obs_uv, obs_ur, octv, (qt, tt), _ = make_problem(noise=0.2, stereo=True)
    q, t, inlier, n_in = _solve(cfg, pts, obs_uv, obs_ur, octv)
    assert pose_err(q, t, qt, tt) < 2e-3
    assert int(n_in) > 180


def test_pose_opt_with_outliers():
    cfg, pts, obs_uv, obs_ur, octv, (qt, tt), out_idx = make_problem(
        noise=0.2, outlier_frac=0.25)
    q, t, inlier, n_in = _solve(cfg, pts, obs_uv, obs_ur, octv)
    assert pose_err(q, t, qt, tt) < 5e-3
    inl = np.asarray(inlier)
    # all injected outliers rejected
    assert not inl[out_idx].any()
    assert int(n_in) > 120


def test_pose_opt_noiseless_exact():
    cfg, pts, obs_uv, obs_ur, octv, (qt, tt), _ = make_problem(noise=0.0)
    q, t, _, n_in = _solve(cfg, pts, obs_uv, obs_ur, octv)
    assert pose_err(q, t, qt, tt) < 1e-5
    assert int(n_in) == 200


def test_pose_opt_far_init():
    """Start far from the optimum (large perturbation) — LM must still converge."""
    cfg, pts, obs_uv, obs_ur, octv, (qt, tt), _ = make_problem(noise=0.1, stereo=True)
    q0, t0 = se3.exp(jnp.asarray([0.5, 0.3, -0.4, 0.15, 0.1, -0.12]))
    q, t, _, n_in = _solve(cfg, pts, obs_uv, obs_ur, octv, q0, t0)
    assert pose_err(q, t, qt, tt) < 5e-3
