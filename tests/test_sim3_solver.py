"""Horn Sim3 closed form + RANSAC tests (SURVEY.md §4: Horn Sim3 oracle on
synthetic data)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import camera, se3
from orb_slam_2_ros_tpu.solvers import sim3_solver

RNG = np.random.default_rng(17)


def make_sim3_problem(n=80, scale=1.3, noise=0.0, outlier_frac=0.0):
    """Points seen by camera 2; camera-1 coords are S12(x2)."""
    cfg = SlamConfig()
    x2 = np.stack([RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
                   RNG.uniform(3, 8, n)], -1).astype(np.float32)
    q = se3.quat_exp(jnp.asarray([0.1, -0.2, 0.05]))
    t = jnp.asarray([0.4, -0.1, 0.3], jnp.float32)
    x1 = scale * se3.quat_rotate(q, jnp.asarray(x2)) + t
    x1 = np.asarray(x1)
    if noise:
        x1 = x1 + RNG.normal(0, noise, x1.shape).astype(np.float32)
    if outlier_frac:
        k = int(outlier_frac * n)
        idx = RNG.choice(n, k, replace=False)
        x1[idx] += RNG.uniform(1.0, 3.0, (k, 3)) * RNG.choice([-1, 1], (k, 3))
    uv1 = np.asarray(camera.project(cfg.camera, jnp.asarray(x1)))
    uv2 = np.asarray(camera.project(cfg.camera, jnp.asarray(x2)))
    return (cfg, jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(uv1),
            jnp.asarray(uv2), q, t, scale)


def test_horn_exact():
    cfg, x1, x2, uv1, uv2, q, t, s = make_sim3_problem()
    qe, te, se_ = sim3_solver.horn_sim3(x1, x2)
    assert abs(float(se_[0]) - s) < 1e-3
    np.testing.assert_allclose(np.asarray(te), np.asarray(t), atol=1e-3)
    dq = se3.quat_mul(se3.quat_conj(qe), q)
    assert abs(abs(float(dq[0])) - 1.0) < 1e-6


def test_horn_fixed_scale():
    cfg, x1, x2, uv1, uv2, q, t, s = make_sim3_problem(scale=1.0)
    qe, te, se_ = sim3_solver.horn_sim3(x1, x2, fix_scale=True)
    assert float(se_[0]) == 1.0
    np.testing.assert_allclose(np.asarray(te), np.asarray(t), atol=1e-3)


def test_ransac_sim3_with_outliers():
    cfg, x1, x2, uv1, uv2, q, t, s = make_sim3_problem(
        noise=0.01, outlier_frac=0.3)
    n = x1.shape[0]
    fn = jax.jit(lambda *a: sim3_solver.ransac_sim3(*a, cfg,
                                                    jax.random.PRNGKey(0)))
    qe, te, se_, inl, n_inl = fn(x1, x2, jnp.ones((n,), bool), uv1, uv2)
    assert int(n_inl) > 0.6 * n
    assert abs(float(se_[0]) - s) < 0.02
    np.testing.assert_allclose(np.asarray(te), np.asarray(t), atol=0.05)
    dq = se3.quat_mul(se3.quat_conj(qe), q)
    rot_err = np.degrees(2 * np.arccos(np.clip(abs(float(dq[0])), 0, 1)))
    assert rot_err < 1.0


def test_ransac_sim3_respects_valid_mask():
    cfg, x1, x2, uv1, uv2, q, t, s = make_sim3_problem(noise=0.005)
    n = x1.shape[0]
    # poison the masked-out half; solution must ignore it
    x1 = x1.at[: n // 2].add(100.0)
    valid = jnp.arange(n) >= n // 2
    qe, te, se_, inl, n_inl = sim3_solver.ransac_sim3(
        x1, x2, valid, uv1, uv2, cfg, jax.random.PRNGKey(1))
    assert not bool(jnp.any(inl[: n // 2]))
    assert abs(float(se_[0]) - s) < 0.02


def test_refine_sim3_lm_improves_biased_estimate():
    """Start from a deliberately perturbed transform: the LM must move the
    estimate substantially toward the truth (strict improvement — a
    silently inert refinement fails this)."""
    cfg, x1, x2, uv1, uv2, q, t, s = make_sim3_problem(
        noise=0.01, outlier_frac=0.2)
    n = x1.shape[0]
    dq = se3.quat_exp(jnp.asarray([0.02, -0.015, 0.01]))
    q0 = se3.quat_normalize(se3.quat_mul(dq, q))
    t0 = t + jnp.asarray([0.05, -0.03, 0.02])
    s0 = jnp.asarray([s * 1.05])
    qr, tr, sr, inl2, n2 = sim3_solver.refine_sim3_lm(
        q0, t0, s0, x1, x2, uv1, uv2, jnp.ones((n,), bool), cfg)

    def err(qq, tt, ss):
        d = np.asarray(tt) - np.asarray(t)
        dq_ = se3.quat_mul(se3.quat_conj(qq), q)
        rot = np.degrees(2 * np.arccos(np.clip(abs(float(dq_[0])), 0, 1)))
        return np.linalg.norm(d) + rot + abs(float(ss[0]) - s)

    e_before = err(q0, t0, s0)
    e_after = err(qr, tr, sr)
    assert e_after < 0.25 * e_before, (e_before, e_after)
    assert abs(float(sr[0]) - s) < 0.02
    # the Huber kernel keeps the clean matches and sheds the outliers
    assert 0.6 * n < int(n2) < 0.9 * n


def test_refine_sim3_fix_scale_keeps_scale():
    cfg, x1, x2, uv1, uv2, q, t, s = make_sim3_problem(scale=1.0, noise=0.01)
    n = x1.shape[0]
    # perturbed start so the refinement must actually move rotation/t
    dq = se3.quat_exp(jnp.asarray([0.02, -0.01, 0.015]))
    q0, t0, s0 = sim3_solver.horn_sim3(x1, x2, fix_scale=True)
    q0 = se3.quat_normalize(se3.quat_mul(dq, q0))
    qr, tr, sr, inl, n2 = sim3_solver.refine_sim3_lm(
        q0, t0, s0, x1, x2, uv1, uv2, jnp.ones((n,), bool), cfg,
        fix_scale=True)
    assert abs(float(sr[0]) - 1.0) < 1e-6
    dq_after = se3.quat_mul(se3.quat_conj(qr), q)
    rot_after = np.degrees(2 * np.arccos(np.clip(abs(float(dq_after[0])), 0, 1)))
    assert rot_after < 0.5   # the injected ~1.6 deg perturbation removed
