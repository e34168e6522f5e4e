"""Sim(3) similarity transforms: (quaternion, translation, scale).

Functional replacement for g2o's ``Sim3`` type (``sim3.h``) used by loop
closing (``LoopClosing.cc:277-476``) and the essential-graph optimization
(``Optimizer.cc:902-1165``). Layout: ``q`` (..., 4) wxyz, ``t`` (..., 3),
``s`` (..., 1) scale. ``apply(q,t,s,x) = s * R @ x + t``.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam_2_ros_tpu.geometry import se3

_EPS = 1e-8


def identity(shape=()):
    return se3.quat_identity(shape), jnp.zeros(shape + (3,)), jnp.ones(shape + (1,))


def from_se3(q, t):
    return q, t, jnp.ones(t.shape[:-1] + (1,))


def to_se3(q, t, s):
    """Sim3 -> SE3 with t/s (essential-graph SE3 recovery, Optimizer.cc:1134-1141)."""
    return q, t / jnp.maximum(s, _EPS)


def apply(q, t, s, x):
    return s * se3.quat_rotate(q, x) + t


def compose(qa, ta, sa, qb, tb, sb):
    """(Sa * Sb)(x) = Sa(Sb(x))."""
    q = se3.quat_normalize(se3.quat_mul(qa, qb))
    s = sa * sb
    t = sa * se3.quat_rotate(qa, tb) + ta
    return q, t, s


def inverse(q, t, s):
    qi = se3.quat_conj(q)
    si = 1.0 / jnp.maximum(s, _EPS)
    ti = -si * se3.quat_rotate(qi, t)
    return qi, ti, si


def exp(xi):
    """sim(3) (..., 7) = [rho(3), phi(3), sigma(1)] -> (q, t, s).

    Uses the closed-form W matrix (cf. g2o sim3.h constructor from a 7-vector);
    series fallbacks near zero keep it differentiable.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = se3.quat_exp(phi)
    s = jnp.exp(sigma)
    theta, _, _ = se3._safe_norm(phi, 1e-7)

    # W = A*I + B*[phi]x + C*[phi]x^2 with the standard sim3 coefficients
    sig2 = sigma * sigma
    th2 = theta * theta
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5

    # A = (s - 1)/sigma  (-> 1 as sigma -> 0)
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0,
                  (s - 1.0) / jnp.where(small_sig, 1.0, sigma))

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = jnp.maximum(sig2 + th2, _EPS)
    a_coef = (s * sin_t) * sigma + (1.0 - s * cos_t) * theta
    B_gen = (a_coef / jnp.maximum(theta, _EPS)) / denom
    C_gen = (A - (s * cos_t - 1.0) * sigma / denom - (s * sin_t) * theta / denom) / jnp.maximum(th2, _EPS)
    # sigma -> 0 limits (pure SE3 V matrix)
    B_se3 = jnp.where(small_th, 0.5 - th2 / 24.0, (1.0 - cos_t) / jnp.maximum(th2, _EPS))
    C_se3 = jnp.where(small_th, 1.0 / 6.0 - th2 / 120.0,
                      (theta - sin_t) / jnp.maximum(th2 * theta, _EPS))
    # theta -> 0, sigma != 0 limits
    B_sig = jnp.where(small_sig, 0.5 + sigma / 6.0,
                      (sigma * s - s + 1.0) / jnp.where(small_sig, 1.0, sig2))
    C_sig = jnp.where(small_sig, 1.0 / 6.0 + sigma / 24.0,
                      (0.5 * sig2 * s + s - 1.0 - sigma * s) /
                      jnp.where(small_sig, 1.0, sig2 * jnp.maximum(jnp.abs(sigma), _EPS) * jnp.sign(sigma + _EPS)))
    B = jnp.where(small_th, B_sig * 0 + jnp.where(small_sig, B_se3, B_sig), B_gen)
    C = jnp.where(small_th, jnp.where(small_sig, C_se3, C_sig), C_gen)

    cross1 = jnp.cross(phi, rho)
    cross2 = jnp.cross(phi, cross1)
    t = A * rho + B * cross1 + C * cross2
    return q, t, s


def log(q, t, s):
    """Inverse of exp via solving W rho = t with the 3x3 W matrix."""
    phi = se3.quat_log(q)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    # rebuild W from exp's coefficients and solve
    xi0 = jnp.concatenate([jnp.zeros_like(phi), phi, sigma], axis=-1)
    # compute W columns by applying exp's linear map to basis vectors
    eye = jnp.eye(3)
    def col(e):
        xi = jnp.concatenate([jnp.broadcast_to(e, phi.shape), phi, sigma], axis=-1)
        _, tc, _ = exp(xi)
        return tc
    W = jnp.stack([col(eye[0]), col(eye[1]), col(eye[2])], axis=-1)  # (...,3,3)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    del xi0
    return jnp.concatenate([rho, phi, sigma], axis=-1)
