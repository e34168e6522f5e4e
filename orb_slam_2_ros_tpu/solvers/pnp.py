"""EPnP + RANSAC: camera pose from 3D-2D correspondences (relocalization).

Replaces ``PnPsolver`` (SURVEY.md §2.9, ``PnPsolver.cc``): the reference runs
adaptive sequential RANSAC (``iterate``, ``PnPsolver.cc:121-259``), each
iteration solving EPnP on a 4-point minimal set — control points via PCA
(``:376-410``), barycentric coordinates (``:412-435``), the 2n x 12 M matrix,
beta cases 1-3 with Gauss-Newton (``:668-859``), Horn absolute orientation for
R,t (``:570-628``). Here ALL hypotheses are drawn up front and solved in one
vmapped batch (6-point sets for conditioning), using the beta-1 closed form
(the dominant-eigenvector case) — the pose LM refinement that follows
relocalization (``Tracking.cc:1632``) supplies the precision the reference
gets from its beta-case search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import camera, se3
from orb_slam_2_ros_tpu.ops import linalg

MIN_SET = 6   # points per hypothesis (4 is minimal; 6 conditions the eig)


def _control_points(xw: jnp.ndarray, w: jnp.ndarray):
    """4 control points: weighted centroid + principal axes
    (``PnPsolver::choose_control_points``, ``PnPsolver.cc:376-410``)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(xw * w[:, None], axis=0) / wsum
    d = (xw - c0) * w[:, None]
    cov = d.T @ d / wsum
    evals, evecs = jnp.linalg.eigh(cov)               # ascending
    sig = jnp.sqrt(jnp.maximum(evals, 1e-12))
    # c1..c3 = centroid +/- scaled principal directions
    cws = jnp.stack([c0,
                     c0 + sig[2] * evecs[:, 2],
                     c0 + sig[1] * evecs[:, 1],
                     c0 + sig[0] * evecs[:, 0]], axis=0)   # (4, 3)
    return cws


def _barycentric(xw: jnp.ndarray, cws: jnp.ndarray):
    """alphas (n, 4) with sum 1: xw = alphas @ cws
    (``compute_barycentric_coordinates``, ``PnPsolver.cc:412-435``)."""
    CC = jnp.concatenate([cws.T, jnp.ones((1, 4))], axis=0)     # (4, 4)
    X = jnp.concatenate([xw.T, jnp.ones((1, xw.shape[0]))], axis=0)
    return jnp.linalg.solve(CC, X).T                            # (n, 4)


def epnp(xw: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray, K: jnp.ndarray):
    """Closed-form EPnP (beta-1 case). xw (n, 3) world points, uv (n, 2)
    pixels, w (n,) weights/mask, K intrinsics. Returns (q, t) world->camera.
    """
    n = xw.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    cws = _control_points(xw, w)
    alphas = _barycentric(xw, cws)                    # (n, 4)

    # M rows: for each point 2 rows over the 12 control-point coords
    a = alphas * w[:, None]
    u, v = uv[:, 0], uv[:, 1]
    zeros = jnp.zeros((n, 4))
    ru = jnp.stack([a * fx, zeros, a * (cx - u)[:, None]], axis=-1)  # (n,4,3)
    rv = jnp.stack([zeros, a * fy, a * (cy - v)[:, None]], axis=-1)
    M = jnp.concatenate([ru.reshape(n, 12), rv.reshape(n, 12)], axis=0)

    G = M.T @ M
    # f32-safe smallest eigenvector (see ops/linalg.py)
    vvec = linalg.min_eigvec(G)
    ccs = vvec.reshape(4, 3)                          # camera control points

    # beta from matching the 6 pairwise control-point distances
    ii, jj = jnp.triu_indices(4, k=1)
    dc = ccs[ii] - ccs[jj]
    dw = cws[ii] - cws[jj]
    beta = jnp.sum(jnp.linalg.norm(dw, axis=-1)
                   * jnp.linalg.norm(dc, axis=-1)) / jnp.maximum(
        jnp.sum(jnp.sum(dc * dc, axis=-1)), 1e-12)
    ccs = ccs * beta
    # cheirality: camera points must be in front
    xc = alphas @ ccs
    flip = jnp.sum(jnp.where(w > 0, jnp.sign(xc[:, 2]), 0.0))
    ccs = jnp.where(flip < 0, -ccs, ccs)
    xc = alphas @ ccs

    # Horn absolute orientation world->camera (fixed scale = 1)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_w = jnp.sum(xw * w[:, None], 0) / wsum
    mu_c = jnp.sum(xc * w[:, None], 0) / wsum
    Mtx = ((xc - mu_c) * w[:, None]).T @ (xw - mu_w)
    Sxx, Sxy, Sxz = Mtx[0, 0], Mtx[0, 1], Mtx[0, 2]
    Syx, Syy, Syz = Mtx[1, 0], Mtx[1, 1], Mtx[1, 2]
    Szx, Szy, Szz = Mtx[2, 0], Mtx[2, 1], Mtx[2, 2]
    N = jnp.array([
        [Sxx + Syy + Szz, Syz - Szy,       Szx - Sxz,        Sxy - Syx],
        [Syz - Szy,       Sxx - Syy - Szz, Sxy + Syx,        Szx + Sxz],
        [Szx - Sxz,       Sxy + Syx,       -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx,       Szx + Sxz,       Syz + Szy,        -Sxx - Syy + Szz]])
    _, evq = jnp.linalg.eigh(N)
    q = evq[:, -1]
    q = se3.quat_conj(q * jnp.sign(q[0] + 1e-12))     # world->camera rotation
    t = mu_c - se3.quat_rotate(q, mu_w)
    return q, t


def ransac_pnp(xw: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
               cfg: SlamConfig, key: jax.Array, n_hyp: int = 256,
               th2: float = 5.991):
    """Vmapped-RANSAC EPnP: pose from 3D-2D matches under outliers.

    xw (N, 3), uv (N, 2), valid (N,). Returns (q, t, inlier_mask, n_inliers).
    th2 is the chi2 0.95 2-dof gate on squared pixel error
    (``PnPsolver::SetRansacParameters`` default, ``PnPsolver.cc:96-118``).
    """
    n = xw.shape[0]
    K = camera.intrinsics(cfg.camera)
    pw = valid.astype(jnp.float32)
    pw = pw / jnp.maximum(jnp.sum(pw), 1e-9)
    idx = jax.random.choice(key, n, shape=(n_hyp, MIN_SET), replace=True, p=pw)

    def solve_one(ids):
        return epnp(xw[ids], uv[ids], jnp.ones((MIN_SET,)), K)

    qs, ts = jax.vmap(solve_one)(idx)

    def count(q, t):
        xc = se3.apply(q, t, xw)
        pr = camera.project(cfg.camera, xc)
        e = jnp.sum((pr - uv) ** 2, axis=-1)
        return valid & (e < th2) & (xc[:, 2] > 0)

    inls = jax.vmap(count)(qs, ts)
    counts = jnp.sum(inls, axis=1)
    best = jnp.argmax(counts)
    q, t = qs[best], ts[best]
    inl = inls[best]
    # refine on the best inlier set (EPnP over all inliers, like
    # PnPsolver::Refine, PnPsolver.cc:262-297)
    q2, t2 = epnp(xw, uv, inl.astype(jnp.float32), K)
    inl2 = count(q2, t2)
    better = jnp.sum(inl2) >= counts[best]
    q = jnp.where(better, q2, q)
    t = jnp.where(better, t2, t)
    inl = jnp.where(better, inl2, inl)
    return q, t, inl, jnp.sum(inl)
