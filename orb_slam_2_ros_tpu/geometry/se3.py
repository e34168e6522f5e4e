"""SE(3) rigid transforms as (quaternion, translation) arrays.

Functional replacement for g2o's ``SE3Quat`` (``se3quat.h``) and the
cv::Mat pose plumbing in the reference (``Converter.cc:27-60``). A pose is a
pair of arrays ``q`` (..., 4) wxyz unit quaternion and ``t`` (..., 3); all
functions broadcast over leading axes, so a keyframe pool's poses are just
``q: (MAX_KFS, 4), t: (MAX_KFS, 3)`` and every op here vmaps for free.

Convention matches the reference: poses are world-to-camera ``Tcw``
(``Frame.cc:SetPose``), so ``apply(q, t, x_world) -> x_camera``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------- quaternions

def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonical sign: w >= 0 (keeps log well-behaved near identity)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> wxyz quaternion; branchless Shepperd."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick numerically best by largest pivot
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, _EPS)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0)], -1),
            jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1)], -1),
            jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2)], -1),
            jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3], -1),
        ],
        axis=-2,
    )  # (..., 4cand, 4)
    pivot = jnp.stack([tr, m00, m11, m22], -1)
    idx = jnp.argmax(pivot, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def _safe_norm(v, small_th):
    """(norm, norm2, small) with a differentiation-safe norm: jacfwd through
    ``jnp.linalg.norm`` at 0 yields NaN tangents that ``jnp.where`` cannot
    block (both branches are differentiated) — so sqrt is evaluated away
    from 0 and the small branch must use norm2 (polynomial) only."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = n2 < small_th * small_th
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    return jnp.where(small, 0.0, n), n2, small


def quat_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) vector (..., 3) -> unit quaternion."""
    theta, th2, small = _safe_norm(phi, 1e-6)
    half = 0.5 * theta
    k = jnp.where(small, 0.5 - th2 / 48.0,
                  jnp.sin(half) / jnp.maximum(theta, _EPS))
    w = jnp.where(small, 1.0 - th2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> so(3) vector (..., 3)."""
    q = quat_normalize(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    n, _, small = _safe_norm(v, 1e-6)
    theta = 2.0 * jnp.arctan2(n, w)
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS),
                  theta / jnp.maximum(n, _EPS))
    return k * v


# ----------------------------------------------------------------- SE(3) ops

def identity(shape=()):
    return quat_identity(shape), jnp.zeros(shape + (3,))


def apply(q: jnp.ndarray, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """x_cam = R @ x_world + t."""
    return quat_rotate(q, x) + t


def compose(qa, ta, qb, tb):
    """(Ta * Tb): apply Tb first, then Ta."""
    return quat_normalize(quat_mul(qa, qb)), quat_rotate(qa, tb) + ta


def inverse(q, t):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def relative(qa, ta, qb, tb):
    """T_ab = Ta * Tb^-1 (maps frame-b camera coords to frame-a)."""
    qbi, tbi = inverse(qb, tb)
    return compose(qa, ta, qbi, tbi)


def exp(xi: jnp.ndarray):
    """se(3) twist (..., 6) = [rho(3), phi(3)] -> (q, t) with proper V matrix.

    Ordering [translation, rotation] matches g2o's SE3Quat::exp usage in
    pose optimization updates.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    q = quat_exp(phi)
    theta, th2, small = _safe_norm(phi, 1e-5)
    a = jnp.where(small, 0.5 - th2 / 24.0,
                  (1 - jnp.cos(theta)) / jnp.maximum(th2, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(th2 * theta, _EPS))
    cross1 = jnp.cross(phi, rho)
    cross2 = jnp.cross(phi, cross1)
    t = rho + a * cross1 + b * cross2
    return q, t


def log(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    phi = quat_log(q)
    theta, th2, small = _safe_norm(phi, 1e-5)
    a = jnp.where(small, 1.0 / 12.0 + th2 / 720.0,
                  (1.0 - 0.5 * theta * jnp.cos(0.5 * theta) /
                   jnp.maximum(jnp.sin(0.5 * theta), _EPS)) / jnp.maximum(th2, _EPS))
    cross1 = jnp.cross(phi, t)
    cross2 = jnp.cross(phi, cross1)
    rho = t - 0.5 * cross1 + a * cross2
    return jnp.concatenate([rho, phi], axis=-1)


def to_matrix(q, t):
    """(q, t) -> homogeneous (..., 4, 4)."""
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), t.shape[:-1] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T):
    return quat_from_matrix(T[..., :3, :3]), T[..., :3, 3]


def camera_center(q, t):
    """Ow = -R^T t (KeyFrame::GetCameraCenter)."""
    return -quat_rotate(quat_conj(q), t)
