"""EPnP + RANSAC: camera pose from 3D-2D correspondences (relocalization).

Replaces ``PnPsolver`` (SURVEY.md §2.9, ``PnPsolver.cc``): the reference runs
adaptive sequential RANSAC (``iterate``, ``PnPsolver.cc:121-259``), each
iteration solving EPnP on a minimal set — control points via PCA
(``:376-410``), barycentric coordinates (``:412-435``), the 2n x 12 M matrix,
the three beta-approximation cases each polished by Gauss-Newton on the
control-point distance equations (``:668-859``), and Horn absolute
orientation for R,t (``:570-628``), keeping the case with least reprojection
error (``compute_pose``, ``:440-468``). Here ALL hypotheses are drawn up
front and solved in one vmapped batch (6-point sets for conditioning), with
the same three beta cases + Gauss-Newton evaluated in parallel per
hypothesis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import camera, se3
from orb_slam_2_ros_tpu.ops import linalg
from orb_slam_2_ros_tpu.ops.linalg import f32_matmul

MIN_SET = 6   # points per hypothesis (4 is minimal; 6 conditions the eig)
GN_ITERS = 5  # Gauss-Newton iterations on the betas (PnPsolver.cc:700)


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


def _lstsq(A: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-9):
    """Small least-squares via regularized normal equations (f32-safe at
    these sizes; mirrors the reference's qr_solve, ``PnPsolver.cc:866``)."""
    G = A.T @ A
    G = G + eps * jnp.trace(G) * jnp.eye(G.shape[0]) / G.shape[0]
    return jnp.linalg.solve(G, A.T @ b)


def _horn_rt(xw, xc, w):
    """Absolute orientation world->camera (``PnPsolver::estimate_R_and_t``,
    ``PnPsolver.cc:570-628``). Returns (q, t)."""
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


@f32_matmul
def epnp(xw: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray, K: jnp.ndarray):
    """EPnP with the reference's full beta-case search. xw (n, 3) world
    points, uv (n, 2) pixels, w (n,) weights/mask, K intrinsics. Returns
    (q, t) world->camera of the case with least reprojection error
    (``PnPsolver::compute_pose``, ``PnPsolver.cc:440-468``).
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
    # f32-TPU-safe trailing 4-subspace (see ops/linalg.min_subspace): the
    # beta cases combine the 4 most-null vectors of G
    V = linalg.min_subspace(G, 4).T.reshape(4, 4, 3)  # (case vec, ctrl pt, 3)

    # distance equations over the 6 control-point pairs
    ii, jj = jnp.triu_indices(4, k=1)
    dv = V[:, ii] - V[:, jj]                          # (4, 6, 3)
    rho = jnp.sum((cws[ii] - cws[jj]) ** 2, axis=-1)  # (6,)
    # L10 columns = products [b11,b12,b22,b13,b23,b33,b14,b24,b34,b44]
    pa, pb = jnp.tril_indices(4)                      # (10,) a >= b
    dots = jnp.einsum("aec,bec->eab", dv, dv)         # (6, 4, 4)
    coef = jnp.where(pa == pb, 1.0, 2.0)
    L10 = dots[:, pa, pb] * coef                      # (6, 10)
    # column order above is [11, 12(=21), 22, 13, 23, 33, 14, 24, 34, 44]

    def betas_case1():
        # N=4 approximation: columns b11, b12, b13, b14 (PnPsolver.cc:668)
        A = L10[:, jnp.array([0, 1, 3, 6])]
        b4 = _lstsq(A, rho)
        neg = b4[0] < 0
        b1 = jnp.sqrt(jnp.abs(b4[0]))
        rest = jnp.where(neg, -b4[1:], b4[1:]) / jnp.maximum(b1, 1e-12)
        return jnp.concatenate([b1[None], rest])

    def betas_case2():
        # N=2: columns b11, b12, b22 (PnPsolver.cc:712)
        A = L10[:, jnp.array([0, 1, 2])]
        b3 = _lstsq(A, rho)
        neg = b3[0] < 0
        b1 = jnp.sqrt(jnp.abs(b3[0]))
        b2 = jnp.where(b3[2] * jnp.where(neg, -1.0, 1.0) > 0,
                       jnp.sqrt(jnp.abs(b3[2])), 0.0)
        b1 = jnp.where(b3[1] < 0, -b1, b1)
        return jnp.stack([b1, b2, jnp.zeros(()), jnp.zeros(())])

    def betas_case3():
        # N=3: columns b11, b12, b22, b13, b23 (PnPsolver.cc:742)
        A = L10[:, jnp.array([0, 1, 2, 3, 4])]
        b5 = _lstsq(A, rho)
        neg = b5[0] < 0
        b1 = jnp.sqrt(jnp.abs(b5[0]))
        b2 = jnp.where(b5[2] * jnp.where(neg, -1.0, 1.0) > 0,
                       jnp.sqrt(jnp.abs(b5[2])), 0.0)
        b1 = jnp.where(b5[1] < 0, -b1, b1)
        b3 = b5[3] / jnp.where(jnp.abs(b1) > 1e-12, b1, 1e-12)
        return jnp.stack([b1, b2, b3, jnp.zeros(())])

    def gauss_newton(betas):
        """Refine betas on the distance equations
        (``PnPsolver::gauss_newton``, ``PnPsolver.cc:697-710``)."""
        def step(b, _):
            prods = b[pa] * b[pb]                     # (10,)
            r = rho - L10 @ prods                     # (6,)
            # d(L10 @ prods)/db: sum over columns touching each beta
            Jcols = L10[:, :, None] * (
                (pa[:, None] == jnp.arange(4)[None, :]) * b[pb][:, None]
                + (pb[:, None] == jnp.arange(4)[None, :]) * b[pa][:, None])
            J = jnp.sum(Jcols, axis=1)                # (6, 4)
            db = _lstsq(J, r)
            return b + db, None
        betas, _ = jax.lax.scan(step, betas, None, length=GN_ITERS)
        return betas

    def pose_from_betas(betas):
        ccs = jnp.einsum("c,cpk->pk", betas, V)       # (4, 3)
        xc = alphas @ ccs
        # cheirality: camera points must be in front
        flip = jnp.sum(jnp.where(w > 0, jnp.sign(xc[:, 2]), 0.0))
        xc = jnp.where(flip < 0, -xc, xc)
        q, t = _horn_rt(xw, xc, w)
        prc = se3.apply(q, t, xw)
        pr = jnp.stack([fx * prc[:, 0] / prc[:, 2] + cx,
                        fy * prc[:, 1] / prc[:, 2] + cy], axis=-1)
        err = jnp.sum(jnp.where(w > 0, jnp.sum((pr - uv) ** 2, -1), 0.0))
        err = jnp.where(jnp.all(jnp.isfinite(q)), err, jnp.inf)
        return q, t, err

    cases = jnp.stack([gauss_newton(betas_case1()),
                       gauss_newton(betas_case2()),
                       gauss_newton(betas_case3())])  # (3, 4)
    qs, ts, errs = jax.vmap(pose_from_betas)(cases)
    best = jnp.argmin(errs)
    return qs[best], ts[best]


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
