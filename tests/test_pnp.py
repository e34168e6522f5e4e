"""EPnP + RANSAC tests on synthetic 3D-2D data (SURVEY.md §4: EPnP oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import camera, se3
from orb_slam_2_ros_tpu.solvers import pnp


def make_pnp_problem(n=100, noise=0.0, outlier_frac=0.0, seed=11):
    rng = np.random.default_rng(seed)
    cfg = SlamConfig()
    xw = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(3, 8, n)], -1).astype(np.float32)
    q, t = se3.exp(jnp.asarray([0.2, -0.1, 0.05, 0.1, -0.15, 0.08]))
    uv = np.array(camera.project(cfg.camera, se3.apply(q, t, jnp.asarray(xw))))
    uv += rng.normal(0, noise, uv.shape)
    if outlier_frac:
        k = int(outlier_frac * n)
        idx = rng.choice(n, k, replace=False)
        uv[idx] += rng.uniform(30, 150, (k, 2)) * rng.choice([-1, 1], (k, 2))
    return cfg, jnp.asarray(xw), jnp.asarray(uv, jnp.float32), q, t


def pose_err(qe, te, q, t):
    d = se3.log(*se3.relative(qe, te, q, t))
    return float(jnp.linalg.norm(d))


def test_epnp_exact():
    cfg, xw, uv, q, t = make_pnp_problem()
    K = camera.intrinsics(cfg.camera)
    qe, te = pnp.epnp(xw, uv, jnp.ones((xw.shape[0],)), K)
    assert pose_err(qe, te, q, t) < 1e-3


def test_epnp_minimal_set():
    cfg, xw, uv, q, t = make_pnp_problem(n=pnp.MIN_SET)
    K = camera.intrinsics(cfg.camera)
    qe, te = pnp.epnp(xw, uv, jnp.ones((xw.shape[0],)), K)
    assert pose_err(qe, te, q, t) < 5e-3


def test_ransac_pnp_with_outliers():
    cfg, xw, uv, q, t = make_pnp_problem(noise=0.5, outlier_frac=0.3)
    n = xw.shape[0]
    fn = jax.jit(lambda *a: pnp.ransac_pnp(*a, cfg, jax.random.PRNGKey(0)))
    qe, te, inl, n_inl = fn(xw, uv, jnp.ones((n,), bool))
    assert int(n_inl) > 0.55 * n
    assert pose_err(qe, te, q, t) < 0.02


def test_ransac_pnp_respects_valid():
    cfg, xw, uv, q, t = make_pnp_problem(noise=0.2)
    n = xw.shape[0]
    uv = uv.at[: n // 2].add(500.0)       # poison the masked half
    valid = jnp.arange(n) >= n // 2
    qe, te, inl, n_inl = pnp.ransac_pnp(xw, uv, valid, cfg,
                                        jax.random.PRNGKey(1))
    assert not bool(jnp.any(inl[: n // 2]))
    assert pose_err(qe, te, q, t) < 0.02
