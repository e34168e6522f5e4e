"""Sim(3) estimation for loop closing: Horn closed form + vmapped RANSAC.

Replaces ``Sim3Solver`` (SURVEY.md §2.10, ``Sim3Solver.cc``): the reference
runs sequential RANSAC iterations, each solving Horn's 1987 absolute
orientation on a random 3-point set (quaternion from the 4x4 eigen-problem,
``Sim3Solver.cc:226-337``) and counting mutual-reprojection inliers
(``:340-364``). Here ALL hypotheses are drawn up front and solved in one
vmapped batch — one ``(H, 3)``-sample eigendecomposition sweep + one
``(H, N)`` inlier matrix, then argmax — more hypotheses per pass, zero
host control flow (SURVEY.md §7.2 RANSAC plan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import camera, se3


from orb_slam_2_ros_tpu.ops.linalg import f32_matmul, solve_spd_unrolled


@f32_matmul
def horn_sim3(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray = None,
              fix_scale: bool = False):
    """Closed-form similarity from matched 3D point sets: x2 ~ S12(x1)...
    actually returns (q, t, s) with ``x1 ~ s * R @ x2 + t`` following the
    reference's convention (``ComputeSim3`` estimates T12 mapping camera-2
    points into camera 1, ``Sim3Solver.cc:226-337``).

    x1, x2: (N, 3); w: optional (N,) weights (mask). Horn 1987:
    centroids -> M = sum (x1-c1)(x2-c2)^T -> 4x4 N matrix -> max-eigenvector
    quaternion; scale from symmetric ratio (``:292-311``); translation closes
    the loop.
    """
    n = x1.shape[0]
    w = jnp.ones((n,)) if w is None else w.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(x1 * w[:, None], 0) / wsum
    c2 = jnp.sum(x2 * w[:, None], 0) / wsum
    r1 = (x1 - c1) * w[:, None]
    r2 = x2 - c2

    M = r1.T @ r2                                     # (3, 3)
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array([
        [Sxx + Syy + Szz, Syz - Szy,       Szx - Sxz,       Sxy - Syx],
        [Syz - Szy,       Sxx - Syy - Szz, Sxy + Syx,       Szx + Sxz],
        [Szx - Sxz,       Sxy + Syx,       -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx,       Szx + Sxz,       Syz + Szy,       -Sxx - Syy + Szz]])
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[:, -1]                                   # max eigenvalue
    # this N layout yields the set1->set2 rotation; we want set2->set1
    q = se3.quat_conj(q * jnp.sign(q[0] + 1e-12))      # wxyz, positive w

    # rotation of r2 into frame 1
    rot_r2 = se3.quat_rotate(q[None], r2) * w[:, None]
    if fix_scale:
        s = jnp.ones(())
    else:
        # symmetric scale: dot(r1, R r2) / |r2|^2 (Horn's closed form; the
        # reference uses nom/den with den = sum |R r2|^2, Sim3Solver.cc:292)
        nom = jnp.sum(r1 * se3.quat_rotate(q[None], r2))
        den = jnp.sum((r2 * r2) * w[:, None])
        s = nom / jnp.maximum(den, 1e-9)
    del rot_r2
    t = c1 - s * se3.quat_rotate(q, c2)
    return q, t, s[None] if s.ndim == 0 else s


def ransac_sim3(x1: jnp.ndarray, x2: jnp.ndarray, valid: jnp.ndarray,
                uv1: jnp.ndarray, uv2: jnp.ndarray, cfg: SlamConfig,
                key: jax.Array, n_hyp: int = 256, fix_scale: bool = False,
                th2_1: float = 9.210, th2_2: float = 9.210):
    """RANSAC over 3-point sets with mutual reprojection inlier check.

    x1/x2: (N, 3) matched 3D points in camera frames 1 and 2; uv1/uv2 their
    observed pixels; valid: (N,) match mask. th2_* are the chi2(0.01, 2-dof)
    gates of ``Sim3Solver.cc:80-84`` (9.210 * sigma^2, sigma from octave —
    callers fold the octave factor into th2 arrays if needed).

    Returns (q12, t12, s12, inlier_mask (N,), n_inliers). All hypotheses are
    solved and scored in one batch; the best-by-count wins (``iterate``,
    ``Sim3Solver.cc:140-223``).
    """
    n = x1.shape[0]
    pw = valid.astype(jnp.float32)
    pw = pw / jnp.maximum(jnp.sum(pw), 1e-9)
    idx = jax.random.choice(key, n, shape=(n_hyp, 3), replace=True, p=pw)

    def solve_one(ids):
        return horn_sim3(x1[ids], x2[ids], fix_scale=fix_scale)

    qs, ts, ss = jax.vmap(solve_one)(idx)              # (H,4),(H,3),(H,1)

    def count_inliers(q, t, s):
        # project x2 through S12 into camera 1 and x1 through S21 into cam 2
        x2_in1, x1_in2, p1, p2 = _mutual_project(q, t, s, x1, x2, cfg)
        e1 = jnp.sum((p1 - uv1) ** 2, -1)
        e2 = jnp.sum((p2 - uv2) ** 2, -1)
        inl = valid & (e1 < th2_1) & (e2 < th2_2) & (x2_in1[:, 2] > 0) & (x1_in2[:, 2] > 0)
        return inl

    inls = jax.vmap(count_inliers)(qs, ts, ss)         # (H, N)
    counts = jnp.sum(inls, axis=1)
    best = jnp.argmax(counts)
    q, t, s = qs[best], ts[best], ss[best]
    # refine once on the best inlier set (closed form on all inliers)
    inl = inls[best]
    q2, t2, s2 = horn_sim3(x1, x2, w=inl.astype(jnp.float32),
                           fix_scale=fix_scale)
    inl2 = count_inliers(q2, t2, s2)
    better = jnp.sum(inl2) >= counts[best]
    q = jnp.where(better, q2, q)
    t = jnp.where(better, t2, t)
    s = jnp.where(better, s2, s)
    inl = jnp.where(better, inl2, inl)
    return q, t, s, inl, jnp.sum(inl)


def _sim3_inv(q, t, s):
    qi = se3.quat_conj(q)
    si = 1.0 / jnp.maximum(s, 1e-9)
    ti = -si * se3.quat_rotate(qi, t)
    return qi, ti, si


def _mutual_project(q, t, s, x1, x2, cfg):
    """Forward/inverse Sim3 projection pair shared by RANSAC scoring and
    the LM refinement: returns (x2_in1, x1_in2, p1, p2)."""
    x2_in1 = s * se3.quat_rotate(q[None], x2) + t
    qi, ti, si = _sim3_inv(q, t, s)
    x1_in2 = si * se3.quat_rotate(qi[None], x1) + ti
    p1 = camera.project(cfg.camera, x2_in1)
    p2 = camera.project(cfg.camera, x1_in2)
    return x2_in1, x1_in2, p1, p2


@f32_matmul
def refine_sim3_lm(q, t, s, x1, x2, uv1, uv2, valid, cfg: SlamConfig,
                   fix_scale: bool = False, n_iters: int = 10,
                   huber2: float = 10.0):
    """Huber-robust Sim3 refinement with forward + inverse projection edges.

    Replaces ``Optimizer::OptimizeSim3`` (``Optimizer.cc:1177-1414``): one
    Sim3 vertex, per-pair ``EdgeSim3ProjectXYZ`` (project S12(x2) into
    camera 1) and ``EdgeInverseSim3ProjectXYZ`` (project S12^-1(x1) into
    camera 2), Huber kernel, LM with accept/reject. Jacobians are
    forward-mode through the left-multiplicative local update
    ``S <- exp(d) * S`` (d in sim3, scale row zeroed when fix_scale).

    Two phases like the reference: 5 iterations over ALL pairs with the
    Huber kernel, then HARD REMOVAL of pairs with chi2 > th in either
    view (``Optimizer.cc:1306-1319`` deletes the edge pair outright — the
    Huber influence is unbounded in sqrt, so a handful of gross outliers
    from duplicated seam landmarks can otherwise out-pull dozens of
    inliers), then ``n_iters`` MORE iterations on the survivors — the
    total budget is ``n1 + n_iters``, matching the reference's worst case
    (5 iterations, outlier removal, then ``nMoreIterations = 10`` more,
    ``Optimizer.cc:1290,1321-1350``).

    Returns (q, t, s, inlier_mask, n_inliers) with inliers by the same
    chi2 gate.
    """
    from orb_slam_2_ros_tpu.geometry import sim3 as sim3_mod

    def residuals(d, q, t, s):
        q2, t2, s2 = sim3_mod.compose(*sim3_mod.exp(d), q, t, s)
        _, _, p1, p2 = _mutual_project(q2, t2, s2, x1, x2, cfg)
        return jnp.concatenate([p1 - uv1, p2 - uv2], axis=-1)   # (N, 4)

    z7 = jnp.zeros((7,))
    scale_mask = jnp.ones((7,)).at[6].set(0.0 if fix_scale else 1.0)

    def chi2_of(e):
        return jnp.sum(e[:, :2] ** 2, -1), jnp.sum(e[:, 2:] ** 2, -1)

    def robust_err(e, keep):
        c1, c2 = chi2_of(e)
        rho1 = jnp.where(c1 <= huber2, c1,
                         2 * jnp.sqrt(huber2 * jnp.maximum(c1, 0)) - huber2)
        rho2 = jnp.where(c2 <= huber2, c2,
                         2 * jnp.sqrt(huber2 * jnp.maximum(c2, 0)) - huber2)
        return jnp.sum(jnp.where(keep, rho1 + rho2, 0.0))

    def system(q, t, s, mask):
        e = residuals(z7, q, t, s)
        J = jax.jacfwd(residuals)(z7, q, t, s)          # (N, 4, 7)
        c1, c2 = chi2_of(e)
        w1 = jnp.where(c1 <= huber2, 1.0,
                       jnp.sqrt(huber2 / jnp.maximum(c1, 1e-12)))
        w2 = jnp.where(c2 <= huber2, 1.0,
                       jnp.sqrt(huber2 / jnp.maximum(c2, 1e-12)))
        w = jnp.concatenate([jnp.stack([w1, w1], -1),
                             jnp.stack([w2, w2], -1)], -1)  # (N, 4)
        w = w * mask[:, None]
        H = jnp.einsum("nia,ni,nib->ab", J, w, J)
        b = jnp.einsum("nia,ni->a", J, w * e)
        return H, b

    def lm_phase(q, t, s, keep, n):
        mask = keep.astype(jnp.float32)

        def body(_, carry):
            q, t, s, lam, err = carry
            H, b = system(q, t, s, mask)
            H = H * scale_mask[:, None] * scale_mask[None, :] \
                + jnp.diag(1.0 - scale_mask)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7)
            # unrolled SPD solve: TPU's LU/TriangularSolve is an
            # approximate blocked inversion (see ops/linalg.min_eigvec)
            d = -jnp.nan_to_num(solve_spd_unrolled(Hd, b * scale_mask))
            d = d * scale_mask
            q2, t2, s2 = sim3_mod.compose(*sim3_mod.exp(d), q, t, s)
            # error-only candidate evaluation (no Jacobian)
            err_new = robust_err(residuals(z7, q2, t2, s2), keep)
            improved = err_new < err
            q = jnp.where(improved, q2, q)
            t = jnp.where(improved, t2, t)
            s = jnp.where(improved, s2, s)
            lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0),
                           1e-9, 1e6)
            err = jnp.where(improved, err_new, err)
            return q, t, s, lam, err

        err0 = robust_err(residuals(z7, q, t, s), keep)
        q, t, s, _, _ = jax.lax.fori_loop(
            0, n, body, (q, t, s, jnp.float32(1e-4), err0))
        return q, t, s

    # gross-outlier trim at the INITIAL transform: the Huber influence is
    # unbounded in sqrt(chi2), so duplicated-seam pairs at 1e5 px^2 out-pull
    # dozens of sub-gate inliers during phase 1 (measured: 30 entry inliers
    # collapsed to 10). Pairs beyond ~30 px of error cannot be "regained"
    # by a valid refinement anyway; borderline pairs (<= 100x the gate)
    # stay in and can re-enter through the phases.
    e = residuals(z7, q, t, s)
    c1, c2 = chi2_of(e)
    trim = valid & (c1 <= 100.0 * huber2) & (c2 <= 100.0 * huber2)
    n1 = min(cfg.solver.sim3_iters, n_iters)
    q, t, s = lm_phase(q, t, s, trim, n1)
    e = residuals(z7, q, t, s)
    c1, c2 = chi2_of(e)
    keep = trim & (c1 <= huber2) & (c2 <= huber2)
    q, t, s = lm_phase(q, t, s, keep, n_iters)

    e = residuals(z7, q, t, s)
    c1, c2 = chi2_of(e)
    inl = keep & (c1 <= huber2) & (c2 <= huber2)
    return q, t, s, inl, jnp.sum(inl.astype(jnp.int32))
