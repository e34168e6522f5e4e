"""Bundle adjustment: masked LM with a matrix-free Schur-complement solve.

Replaces g2o's BlockSolver + sparse Cholesky path used by
``Optimizer::LocalBundleAdjustment`` (``Optimizer.cc:517-890``) and
``GlobalBundleAdjustemnt`` (``:41-262``), keeping the same marginalization
structure (`vPoint->setMarginalized(true)`, ``Optimizer.cc:113``): each LM
step eliminates the 3x3 landmark blocks in closed form (batched inverses)
and solves the reduced camera system S = Hcc - Hcp Hpp^-1 Hpc with
preconditioned conjugate gradients, where every S-product is evaluated
edge-wise (gather -> 3x6/3x3 einsum -> scatter). No sparse matrix is ever
materialized; this is the TPU-shaped Schur pattern that also distributes
(psum the per-shard S-products, SURVEY.md §2.D).

Semantics kept from the reference: Huber kernel (delta^2 = 5.991 mono /
7.815 stereo), per-octave invSigma2 weighting, two-phase optimize
(5 iters -> chi2 outlier pruning -> 10 iters, ``Optimizer.cc:760-813``),
gauge fixed by freezing listed cameras (first KF / fixed ring).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.ops.linalg import f32_matmul
from orb_slam_2_ros_tpu.geometry import se3

_EPS = 1e-9


class BAProblem(NamedTuple):
    """Static-shape BA instance. E edges reference C cameras and M points."""

    cam_idx: jnp.ndarray    # (E,) int32 -> camera slot
    mp_idx: jnp.ndarray     # (E,) int32 -> point slot
    obs: jnp.ndarray        # (E, 3) (u, v, uR); uR component masked for mono
    is_stereo: jnp.ndarray  # (E,) bool
    inv_sigma2: jnp.ndarray  # (E,) float32
    valid: jnp.ndarray      # (E,) bool


def build_problem(kf_uv, kf_ur, kf_octave, kf_mp, kf_kp_valid,
                  cfg: SlamConfig) -> BAProblem:
    """Assemble edges from C rows of the observation table
    ((C, P) slices of the MapState keyframe pools)."""
    C, P = kf_mp.shape
    cam_idx = jnp.repeat(jnp.arange(C, dtype=jnp.int32), P)
    mp_idx = kf_mp.reshape(-1)
    ur = kf_ur.reshape(-1)
    obs = jnp.concatenate([kf_uv.reshape(-1, 2), ur[:, None]], axis=-1)
    octv = kf_octave.reshape(-1)
    valid = (mp_idx >= 0) & kf_kp_valid.reshape(-1)
    return BAProblem(
        cam_idx=cam_idx, mp_idx=jnp.clip(mp_idx, 0), obs=obs,
        is_stereo=ur > 0,
        inv_sigma2=cfg.orb.scale_factor ** (-2.0 * octv.astype(jnp.float32)),
        valid=valid)


def _edge_terms(prob: BAProblem, q, t, pos, cfg: SlamConfig):
    """Residuals e (E, 3), camera Jacobians Jc (E, 3, 6), point Jacobians
    Jp (E, 3, 3), depth z (E,). Camera update is left-multiplied
    exp(xi)*T; point update is additive in world frame. Matches g2o's
    EdgeSE3ProjectXYZ / EdgeStereoSE3ProjectXYZ
    (``types_six_dof_expmap.h:80-174``)."""
    cam = cfg.camera
    qc = q[prob.cam_idx]
    tc = t[prob.cam_idx]
    pw = pos[prob.mp_idx]
    xc = se3.apply(qc, tc, pw)
    x, y = xc[:, 0], xc[:, 1]
    z = jnp.maximum(xc[:, 2], _EPS)
    iz = 1.0 / z
    iz2 = iz * iz

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.bf * iz
    e = jnp.stack([u, v, ur], axis=-1) - prob.obs

    du = jnp.stack([cam.fx * iz, jnp.zeros_like(z), -cam.fx * x * iz2], -1)
    dv = jnp.stack([jnp.zeros_like(z), cam.fy * iz, -cam.fy * y * iz2], -1)
    dur = du + jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * iz2], -1)
    dpred_dxc = jnp.stack([du, dv, dur], axis=1)            # (E, 3, 3)

    zeros = jnp.zeros_like(z)
    nskew = jnp.stack([
        jnp.stack([zeros, xc[:, 2], -xc[:, 1]], -1),
        jnp.stack([-xc[:, 2], zeros, xc[:, 0]], -1),
        jnp.stack([xc[:, 1], -xc[:, 0], zeros], -1),
    ], axis=1)                                              # -[xc]x
    eye = jnp.broadcast_to(jnp.eye(3), nskew.shape)
    dxc_dxi = jnp.concatenate([eye, nskew], axis=-1)        # (E, 3, 6)
    Jc = jnp.einsum("eij,ejk->eik", dpred_dxc, dxc_dxi)
    # d(xc)/d(pw) = R
    R = se3.quat_to_matrix(qc)                              # (E, 3, 3)
    Jp = jnp.einsum("eij,ejk->eik", dpred_dxc, R)
    return e, Jc, Jp, z


def _weights(prob: BAProblem, e, z, edge_mask, cfg: SlamConfig,
             use_kernel: bool):
    """Per-edge-component weights W (E, 3) = invSigma2 * huber * comp mask;
    also the robust total error."""
    sc = cfg.solver
    delta2 = jnp.where(prob.is_stereo, sc.huber_stereo2, sc.huber_mono2)
    comp_w = jnp.stack([jnp.ones_like(z), jnp.ones_like(z),
                        prob.is_stereo.astype(jnp.float32)], -1)
    e2 = jnp.sum(e * e * comp_w, axis=-1)
    chi2 = e2 * prob.inv_sigma2
    if use_kernel:
        delta = jnp.sqrt(delta2)
        w_rob = jnp.where(chi2 <= delta2, 1.0,
                          delta / jnp.maximum(jnp.sqrt(chi2), _EPS))
        rho = jnp.where(chi2 <= delta2, chi2, 2 * delta * jnp.sqrt(chi2) - delta2)
    else:
        w_rob = jnp.ones_like(chi2)
        rho = chi2
    ok = edge_mask & (z > _EPS)
    w = jnp.where(ok, prob.inv_sigma2 * w_rob, 0.0)
    err = jnp.sum(jnp.where(ok, rho, 0.0))
    return w[:, None] * comp_w, err


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate/det) — cheaper than LU for
    the (M, 3, 3) landmark blocks."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([co00, co01, co02], -1),
        jnp.stack([co10, co11, co12], -1),
        jnp.stack([co20, co21, co22], -1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _make_lm_step(prob: BAProblem, cfg: SlamConfig, cam_free, mp_free,
                  cg_iters: int, axis_name: str = None,
                  shard_points: bool = False, n_shards: int = 1):
    """Build the Schur-LM step closure shared by ``bundle_adjustment`` and
    the chunked background GBA (``gba_chunk``). One call = one damped LM
    iteration with the CG solve on the reduced camera system.

    Two distribution modes (both require ``axis_name`` inside shard_map):
    - replicated states (default): edge arrays sharded, camera AND point
      states replicated, every edge reduction psum'd.
    - ``shard_points=True``: the POINT state is device-local — ``pos`` and
      ``mp_free`` are the shard's (M/n_shards)-row blocks; point-side
      Hessian blocks, gradients and back-substitution stay on the owner
      shard. Per-edge point gathers ride an ``all_gather`` of the (M, 3)
      position table (~200 KB over ICI) and point-side scatters come back
      via ``psum_scatter`` — the memory-scaling mode of SURVEY.md §2.D:
      point pools and edges scale with the mesh, only the small camera
      system (6K floats) is replicated."""
    C = cam_free.shape[0]
    Ml = mp_free.shape[0]      # local rows (= global M when not sharded)
    Mg = Ml * (n_shards if shard_points else 1)

    def _allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def _gather_pts(x_loc):
        """Local point block -> full (Mg, d) table."""
        if shard_points:
            return jax.lax.all_gather(x_loc, axis_name, axis=0, tiled=True)
        return x_loc

    def _scatter_pts(vals, pi, d_shape):
        """Per-edge point contributions -> OWNED local rows (summed across
        shards). Non-sharded: plain (psum'd) full-table scatter."""
        full = jnp.zeros((Mg,) + d_shape).at[pi].add(vals)
        if shard_points:
            return jax.lax.psum_scatter(full, axis_name,
                                        scatter_dimension=0, tiled=True)
        return _allsum(full)

    camf = cam_free.astype(jnp.float32)[:, None]            # (C, 1)
    mpf = mp_free.astype(jnp.float32)[:, None]              # (Ml, 1)
    mpf_full = _gather_pts(mpf)                             # (Mg, 1)

    def lm_step(q, t, pos, edge_mask, use_kernel, lam, err):
        pos_full = _gather_pts(pos)                         # (Mg, 3)
        e, Jc, Jp, z = _edge_terms(prob, q, t, pos_full, cfg)
        W, _ = _weights(prob, e, z, edge_mask, cfg, use_kernel)

        ci, pi = prob.cam_idx, prob.mp_idx
        # gradients (free-masked)
        We = W * e
        gc = _allsum(jnp.zeros((C, 6)).at[ci].add(
            jnp.einsum("eik,ei->ek", Jc, We))) * camf
        gp = _scatter_pts(jnp.einsum("eik,ei->ek", Jp, We), pi, (3,)) * mpf

        # block diagonals
        Hcc_d = _allsum(jnp.zeros((C, 6, 6)).at[ci].add(
            jnp.einsum("eci,ec,ecj->eij", Jc, W, Jc)))       # (C, 6, 6)
        Hpp = _scatter_pts(jnp.einsum("eci,ec,ecj->eij", Jp, W, Jp),
                           pi, (3, 3))                       # (Ml, 3, 3)

        # LM damping on the diagonals
        dampC = lam * jnp.einsum("cii->ci", Hcc_d) + 1e-8    # (C, 6)
        Hpp_d = Hpp + (lam * jnp.einsum("mii->mi", Hpp) + 1e-8)[..., None] \
            * jnp.eye(3)
        # fixed points: zero inverse removes them from the Schur term
        Hpp_inv = _inv3x3(Hpp_d) * mpf[..., None]

        bc = -gc
        bp = -gp

        def Hpc_mv(xc):
            jx = jnp.einsum("eik,ek->ei", Jc, (xc * camf)[ci])
            return _scatter_pts(jnp.einsum("eik,ei->ek", Jp, W * jx),
                                pi, (3,))

        def Hcp_mv(xp):
            xp_full = _gather_pts(xp)
            jx = jnp.einsum("eik,ek->ei", Jp, (xp_full * mpf_full)[pi])
            return _allsum(jnp.zeros((C, 6)).at[ci].add(
                jnp.einsum("eik,ei->ek", Jc, W * jx))) * camf

        def Hcc_mv(xc):
            jx = jnp.einsum("eik,ek->ei", Jc, (xc * camf)[ci])
            y = _allsum(jnp.zeros((C, 6)).at[ci].add(
                jnp.einsum("eik,ei->ek", Jc, W * jx)))
            return y * camf + dampC * xc * camf

        def S_mv(xc):
            tp = jnp.einsum("mij,mj->mi", Hpp_inv, Hpc_mv(xc))
            return Hcc_mv(xc) - Hcp_mv(tp)

        # reduced RHS: bc~ = bc - Hcp Hpp^-1 bp
        bc_red = (bc - Hcp_mv(jnp.einsum("mij,mj->mi", Hpp_inv, bp))) * camf

        # block-Jacobi preconditioner: damped Hcc blocks for free cameras,
        # identity rows for fixed ones (their residual is always zero)
        Pmat = (Hcc_d + jnp.einsum("ci,ij->cij", dampC, jnp.eye(6))) \
            * camf[..., None] \
            + jnp.eye(6)[None] * (1.0 - camf[..., None]) \
            + jnp.eye(6)[None] * 1e-6
        P_inv = jnp.linalg.inv(Pmat)

        def precond(r):
            return jnp.einsum("cij,cj->ci", P_inv, r) * camf

        # CG on the reduced camera system
        x0 = jnp.zeros((C, 6))
        r0 = bc_red
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_body(_, carry):
            x, r, p, rz = carry
            Ap = S_mv(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            zz = precond(r)
            rz_new = jnp.sum(r * zz)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = zz + beta * p
            return x, r, p, rz_new

        xc, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, p0, rz0))
        # CG on the f32 Schur system can diverge at tiny damping (S goes
        # indefinite under cancellation): sanitize NaN/inf to zero and
        # trust-region the per-camera step so the candidate is always
        # finite — then the err comparison below genuinely decides (a NaN
        # pose would otherwise zero its own edge weights via the z>_EPS
        # mask, read err_new = 0.0, and be accepted, wiping every free
        # camera at once).
        xc = jnp.nan_to_num(xc, nan=0.0, posinf=0.0, neginf=0.0)
        nrm = jnp.linalg.norm(xc, axis=-1, keepdims=True)
        xc = xc * jnp.minimum(1.0, 10.0 / jnp.maximum(nrm, 1e-20))
        # back-substitute landmarks
        xp = jnp.einsum("mij,mj->mi", Hpp_inv, bp - Hpc_mv(xc))

        # candidate update
        dq, dt = se3.exp(xc)
        q_new, t_new = se3.compose(dq, dt, q, t)
        q_new = jnp.where(cam_free[:, None], q_new, q)
        t_new = jnp.where(cam_free[:, None], t_new, t)
        pos_new = jnp.where(mp_free[:, None], pos + xp, pos)

        e2, _, _, z2 = _edge_terms(prob, q_new, t_new,
                                   _gather_pts(pos_new), cfg)
        _, err_new = _weights(prob, e2, z2, edge_mask, cfg, use_kernel)
        err_new = _allsum(err_new)
        improved = err_new < err
        q = jnp.where(improved, q_new, q)
        t = jnp.where(improved, t_new, t)
        pos = jnp.where(improved, pos_new, pos)
        lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0), 1e-10, 1e8)
        err = jnp.where(improved, err_new, err)
        return q, t, pos, lam, err

    return lm_step, _allsum


@f32_matmul
def bundle_adjustment(q, t, cam_free, pos, mp_free, prob: BAProblem,
                      cfg: SlamConfig, phases=(5, 10), cg_iters: int = 100,
                      axis_name: str = None, robust: bool = True):
    """Run Schur-LM bundle adjustment.

    q (C, 4), t (C, 3): world->camera poses; cam_free (C,) bool (False =
    gauge-fixed); pos (M, 3) points; mp_free (M,) bool. phases: LM iteration
    counts with chi2-based edge pruning between phases (reference 5+10).

    With ``axis_name`` set, the function runs inside a ``shard_map`` whose
    edge arrays (``prob``) are sharded over that mesh axis while states are
    replicated: every edge-indexed reduction (gradients, block diagonals,
    Schur matvecs, robust error) gets a ``psum`` — the distributed-BA
    pattern of SURVEY.md §2.D (local Schur elimination + ICI-collective
    camera system). The math is bit-identical to the single-device path.

    Returns (q, t, pos, edge_inlier (E,) bool).
    """
    sc = cfg.solver
    delta2 = jnp.where(prob.is_stereo, sc.huber_stereo2, sc.huber_mono2)
    lm_step, _allsum = _make_lm_step(prob, cfg, cam_free, mp_free,
                                     cg_iters, axis_name)

    def lm_phase(q, t, pos, edge_mask, use_kernel, n_iters):
        e, _, _, z = _edge_terms(prob, q, t, pos, cfg)
        _, err0 = _weights(prob, e, z, edge_mask, cfg, use_kernel)
        err0 = _allsum(err0)

        def body(_, carry):
            q, t, pos, lam, err = carry
            return lm_step(q, t, pos, edge_mask, use_kernel, lam, err)

        q, t, pos, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (q, t, pos, 1e-4, err0))
        return q, t, pos

    edge_mask = prob.valid
    for i, n_iters in enumerate(phases):
        use_kernel = robust and i == 0
        q, t, pos = lm_phase(q, t, pos, edge_mask, use_kernel, n_iters)
        # chi2 pruning between phases (Optimizer.cc:781-812)
        e, _, _, z = _edge_terms(prob, q, t, pos, cfg)
        comp_w = jnp.stack([jnp.ones_like(z), jnp.ones_like(z),
                            prob.is_stereo.astype(jnp.float32)], -1)
        chi2 = jnp.sum(e * e * comp_w, -1) * prob.inv_sigma2
        edge_mask = prob.valid & (chi2 <= delta2) & (z > _EPS)
    return q, t, pos, edge_mask


# --------------------------------------------------------------------------
# Chunked global BA: the background / abortable GBA state machine.
# --------------------------------------------------------------------------

class GBAState(NamedTuple):
    """Device-resident global-BA-in-flight snapshot (the functional analog
    of the reference's detached GBA thread, ``LoopClosing.cc:689``,
    ``RunGlobalBundleAdjustment`` ``:758-862``): the optimization runs on a
    SNAPSHOT of the map while tracking/mapping continue on the live one;
    the finish step reconciles (pipeline/loop_closing.gba_finish)."""

    q: jnp.ndarray          # (K, 4) optimized poses (world->camera)
    t: jnp.ndarray          # (K, 3)
    pos: jnp.ndarray        # (M, 3) optimized points
    lam: jnp.ndarray        # () LM damping
    err: jnp.ndarray        # () robust error
    prob: BAProblem         # snapshot edge set
    cam_free: jnp.ndarray   # (K,) bool
    mp_free: jnp.ndarray    # (M,) bool
    n0: jnp.ndarray         # () int32 n_kfs at snapshot time
    nm0: jnp.ndarray        # () int32 n_mps at snapshot time


@f32_matmul
def gba_init(q, t, cam_free, pos, mp_free, prob: BAProblem, n_kfs, n_mps,
             cfg: SlamConfig, robust: bool = False) -> GBAState:
    """Snapshot the problem and evaluate the starting error."""
    e, _, _, z = _edge_terms(prob, q, t, pos, cfg)
    _, err0 = _weights(prob, e, z, prob.valid, cfg, robust)
    return GBAState(q=q, t=t, pos=pos, lam=jnp.float32(1e-4), err=err0,
                    prob=prob, cam_free=cam_free, mp_free=mp_free,
                    n0=jnp.int32(n_kfs), nm0=jnp.int32(n_mps))


@f32_matmul
def gba_chunk(st: GBAState, cfg: SlamConfig, n_iters: int,
              cg_iters: int = 100, robust: bool = False,
              axis_name: str = None, shard_points: bool = False,
              n_shards: int = 1) -> GBAState:
    """Advance the in-flight GBA by ``n_iters`` LM iterations — the
    ``lax.fori_loop`` segment of SURVEY.md §2.D row 2 ("chunked LM
    iterations with host-checked abort between chunks"). The host
    interleaves these with tracking chunks and drops the state to abort
    (the ``mnFullBAIdx`` protocol, ``LoopClosing.cc:490-502``,
    ``mbStopGBA`` ``:493-499``).

    ``shard_points``: the state's ``pos``/``mp_free`` are per-shard blocks
    (device-local point pools; see ``_make_lm_step``)."""
    lm_step, _ = _make_lm_step(st.prob, cfg, st.cam_free, st.mp_free,
                               cg_iters, axis_name,
                               shard_points=shard_points, n_shards=n_shards)

    def body(_, carry):
        q, t, pos, lam, err = carry
        return lm_step(q, t, pos, st.prob.valid, robust, lam, err)

    q, t, pos, lam, err = jax.lax.fori_loop(
        0, n_iters, body, (st.q, st.t, st.pos, st.lam, st.err))
    return st._replace(q=q, t=t, pos=pos, lam=lam, err=err)


# --------------------------------------------------------------------------
# Dense-Schur chunked GBA: the single-chip background-GBA workhorse.
# --------------------------------------------------------------------------

class DenseGBAState(NamedTuple):
    """Table-layout GBA snapshot for the dense-Schur chunk path. Field
    names q/t/pos/cam_free/mp_free/n0/nm0 deliberately match ``GBAState``
    so the LoopCloser's reconcile step (``_gba_finish``) consumes either.

    ``loop_*``: measured loop-edge relative SE3s entering the camera
    system as strong priors (see ``dense_gba_chunk``); all-zero weights
    when the caller has no seams."""

    q: jnp.ndarray          # (K, 4)
    t: jnp.ndarray          # (K, 3)
    pos: jnp.ndarray        # (M, 3)
    lam: jnp.ndarray        # ()
    err: jnp.ndarray        # ()
    kf_uv: jnp.ndarray      # (K, P, 2) snapshot observations
    kf_ur: jnp.ndarray      # (K, P)
    inv_sigma2: jnp.ndarray  # (K, P)
    kf_mp: jnp.ndarray      # (K, P) int32
    edge_valid: jnp.ndarray  # (K, P) bool
    cam_free: jnp.ndarray   # (K,) bool
    mp_free: jnp.ndarray    # (M,) bool
    n0: jnp.ndarray         # () int32
    nm0: jnp.ndarray        # () int32
    loop_i: jnp.ndarray     # (L,) int32 keyframe c of each seam
    loop_j: jnp.ndarray     # (L,) int32 keyframe k
    loop_q: jnp.ndarray     # (L, 4) measured T_kc rotation (SE3 part)
    loop_t: jnp.ndarray     # (L, 3) measured translation (already /s)
    loop_w: jnp.ndarray     # (L,) float32 prior weight (0 = unused slot)


@f32_matmul
def dense_gba_init(kf_uv, kf_ur, kf_octave, kf_mp, kp_valid, kf_q, kf_t,
                   cam_free, mp_pos, mp_free, n_kfs, n_mps,
                   cfg: SlamConfig, loop_i=None, loop_j=None, loop_q=None,
                   loop_t=None, loop_w=None,
                   n_loop_slots: int = 16) -> DenseGBAState:
    """Snapshot the map's (K, P) observation table for dense-Schur GBA."""
    inv_sigma2 = cfg.orb.scale_factor ** (
        -2.0 * kf_octave.astype(jnp.float32))
    # every valid keyframe's edges constrain the landmarks, free or fixed
    # (callers pass kp_valid already masked by kf_valid; fixed cameras
    # still anchor their points, exactly like the edge-list gba_init)
    edge_valid = kp_valid & (kf_mp >= 0)
    if loop_i is None:
        L = n_loop_slots
        loop_i = jnp.zeros((L,), jnp.int32)
        loop_j = jnp.zeros((L,), jnp.int32)
        loop_q = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (L, 1))
        loop_t = jnp.zeros((L, 3), jnp.float32)
        loop_w = jnp.zeros((L,), jnp.float32)
    st = DenseGBAState(
        q=kf_q, t=kf_t, pos=mp_pos, lam=jnp.float32(1e-4),
        err=jnp.float32(jnp.inf), kf_uv=kf_uv, kf_ur=kf_ur,
        inv_sigma2=inv_sigma2, kf_mp=kf_mp, edge_valid=edge_valid,
        cam_free=cam_free, mp_free=mp_free,
        n0=jnp.int32(n_kfs), nm0=jnp.int32(n_mps),
        loop_i=loop_i, loop_j=loop_j, loop_q=loop_q, loop_t=loop_t,
        loop_w=loop_w)
    err0 = _dense_gba_error(st, cfg)
    return st._replace(err=err0)


def _loop_prior_terms(st: DenseGBAState, q, t):
    """Residuals + analytic-free Jacobians of the seam priors.

    Each accepted loop stores its MEASURED relative pose T_kc (Sim3
    translation already scale-normalized). Residual per edge:
    ``r = log_se3(T_meas^-1 (T_k T_c^-1))`` (6,), with Jacobians w.r.t.
    the left-multiplied increments of T_k and T_c taken by forward-mode
    autodiff at 0 (L <= 16 tiny 6x6 blocks — negligible cost).

    DOCUMENTED DEVIATION from the reference, whose post-loop GBA is pure
    reprojection (``Optimizer.cc:41-262``): on our sparser maps (fewer
    keyframes, pruned old observations) the drift-consistent observation
    majority can out-vote the handful of welded cross-seam observations
    and relax the loop correction away (measured: ATE 0.030 -> 0.214).
    The measured seams re-enter the GBA exactly like they re-enter every
    essential-graph run (``Optimizer.cc:1047``), so the refinement
    redistributes drift WITHOUT reopening what place recognition proved.
    """
    from orb_slam_2_ros_tpu.geometry import se3 as _se3

    def resid_one(ci, ki, qm, tm, xi):
        xi_k, xi_c = xi[:6], xi[6:]
        dqk, dtk = _se3.exp(xi_k)
        dqc, dtc = _se3.exp(xi_c)
        qk, tk = _se3.compose(dqk, dtk, q[ki], t[ki])
        qc, tc = _se3.compose(dqc, dtc, q[ci], t[ci])
        qr, tr = _se3.relative(qk, tk, qc, tc)       # T_k T_c^-1
        qi, ti = _se3.inverse(qm, tm)
        qe, te = _se3.compose(qi, ti, qr, tr)
        return _se3.log(qe, te)

    zero = jnp.zeros((12,))

    def per_edge(ci, ki, qm, tm):
        r0 = resid_one(ci, ki, qm, tm, zero)
        J = jax.jacfwd(lambda xi: resid_one(ci, ki, qm, tm, xi))(zero)
        return r0, J[:, :6], J[:, 6:]                # (6,), (6,6), (6,6)

    return jax.vmap(per_edge)(st.loop_i, st.loop_j, st.loop_q, st.loop_t)


def _dense_gba_terms(st: DenseGBAState, q, t, pos, cfg: SlamConfig):
    """Residuals/Jacobians over the (K, P) table — cameras broadcast per
    row, landmark positions gathered once (the same zero-camera-gather
    shape as the windowed BA)."""
    cam = cfg.camera
    mp_idx = jnp.clip(st.kf_mp, 0)
    pw = pos[mp_idx]                                     # (K, P, 3)
    xc = se3.apply(q[:, None, :], t[:, None, :], pw)
    x, y = xc[..., 0], xc[..., 1]
    z = jnp.maximum(xc[..., 2], _EPS)
    iz = 1.0 / z
    iz2 = iz * iz
    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.bf * iz
    obs = jnp.concatenate([st.kf_uv, st.kf_ur[..., None]], axis=-1)
    e = jnp.stack([u, v, ur], axis=-1) - obs
    du = jnp.stack([cam.fx * iz, jnp.zeros_like(z), -cam.fx * x * iz2], -1)
    dv = jnp.stack([jnp.zeros_like(z), cam.fy * iz, -cam.fy * y * iz2], -1)
    dur = du + jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z),
                          cam.bf * iz2], -1)
    dpred = jnp.stack([du, dv, dur], axis=-2)            # (K, P, 3, 3)
    zeros = jnp.zeros_like(z)
    nskew = jnp.stack([
        jnp.stack([zeros, xc[..., 2], -xc[..., 1]], -1),
        jnp.stack([-xc[..., 2], zeros, xc[..., 0]], -1),
        jnp.stack([xc[..., 1], -xc[..., 0], zeros], -1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3), nskew.shape)
    dxc = jnp.concatenate([eye, nskew], axis=-1)         # (K, P, 3, 6)
    Jc = jnp.einsum("kpij,kpjn->kpin", dpred, dxc)
    R = se3.quat_to_matrix(q)                            # (K, 3, 3)
    Jp = jnp.einsum("kpij,kjn->kpin", dpred, R)
    return e, Jc, Jp, z


def _dense_gba_weights(st: DenseGBAState, e, z):
    """Per-edge-component weights + raw chi2 error (robust=False mirrors
    the reference's GlobalBundleAdjustemnt(bRobust=false) after loops,
    ``LoopClosing.cc:763``)."""
    is_stereo = st.kf_ur > 0
    comp_w = jnp.stack([jnp.ones_like(z), jnp.ones_like(z),
                        is_stereo.astype(jnp.float32)], -1)
    ok = st.edge_valid & (z > _EPS)
    w = jnp.where(ok, st.inv_sigma2, 0.0)
    chi2 = jnp.sum(e * e * comp_w, axis=-1) * st.inv_sigma2
    err = jnp.sum(jnp.where(ok, chi2, 0.0))
    return w[..., None] * comp_w, err


def _loop_prior_error(st: DenseGBAState, q, t):
    """Sum of weighted squared seam-prior residuals (see
    ``_loop_prior_terms``)."""
    from orb_slam_2_ros_tpu.geometry import se3 as _se3

    def one(ci, ki, qm, tm):
        qr, tr = _se3.relative(q[ki], t[ki], q[ci], t[ci])
        qi, ti = _se3.inverse(qm, tm)
        qe, te = _se3.compose(qi, ti, qr, tr)
        r = _se3.log(qe, te)
        return jnp.sum(r * r)

    r2 = jax.vmap(one)(st.loop_i, st.loop_j, st.loop_q, st.loop_t)
    return jnp.sum(st.loop_w * r2)


def _dense_gba_error(st: DenseGBAState, cfg: SlamConfig):
    e, _, _, z = _dense_gba_terms(st, st.q, st.t, st.pos, cfg)
    _, err = _dense_gba_weights(st, e, z)
    return err + _loop_prior_error(st, st.q, st.t)


@f32_matmul
def dense_gba_chunk(st: DenseGBAState, cfg: SlamConfig,
                    n_iters: int) -> DenseGBAState:
    """Advance the GBA by ``n_iters`` dense-Schur LM iterations.

    The matrix-free CG path (``gba_chunk``) costs ~1.45 s per LM iteration
    at bench scale on one chip — 100 CG iterations each doing 4
    gather/scatter passes over the 393k-edge set (TPU random access ~0.125
    elem/cycle). This path instead materializes the FULL reduced camera
    system exactly like the windowed BA: landmark-side reductions are
    one-hot segment-sum MATMULS on the MXU (one (P x M) one-hot per camera
    row inside a lax.scan), the Schur complement is a dense (6K x 6K)
    matrix, and the solve is one LU — no CG, exact step, ~20x faster. The
    memory price is the (M, K, 6, 3) camera-landmark cross-block tensor
    (~300 MB at defaults), comfortably inside one chip's HBM; the
    distributed multi-host path keeps the matrix-free edge-sharded variant
    (parallel/dist_ba.distributed_gba_chunk)."""
    K, P = st.kf_mp.shape
    M = st.pos.shape[0]
    camf = st.cam_free.astype(jnp.float32)
    mp_idx = jnp.clip(st.kf_mp, 0)
    edge_cid = jnp.where(st.edge_valid & st.mp_free[mp_idx], mp_idx, M)
    cmask = st.mp_free

    def lm_step(q, t, pos, lam, err):
        e, Jc, Jp, z = _dense_gba_terms(st, q, t, pos, cfg)
        Wt, _ = _dense_gba_weights(st, e, z)             # (K, P, 3)
        cam_on = camf[:, None, None]
        Wc = Wt * cam_on

        We = Wt * e
        gc = jnp.einsum("kpin,kpi->kn", Jc, We * cam_on)     # (K, 6)
        Hcc = jnp.einsum("kpin,kpi,kpim->knm", Jc, Wc, Jc)   # (K, 6, 6)

        pv = jnp.concatenate([
            jnp.einsum("kpin,kpi->kpn", Jp, We),
            jnp.einsum("kpin,kpi,kpim->kpnm", Jp, Wt, Jp).reshape(K, P, 9),
        ], -1)                                               # (K, P, 12)
        Bv = jnp.einsum("kpin,kpi,kpim->kpnm", Jc, Wc, Jp).reshape(K, P, 18)

        def row_body(carry, xs):
            acc_p, acc_t = carry
            cid_r, pv_r, b_r, row = xs
            oh = (cid_r[:, None] == jnp.arange(M)[None, :]).astype(
                jnp.float32)                                 # (P, M)
            acc_p = acc_p + jnp.matmul(
                oh.T, pv_r, precision=jax.lax.Precision.HIGHEST)
            ct = jnp.matmul(oh.T, b_r,
                            precision=jax.lax.Precision.HIGHEST)  # (M, 18)
            acc_t = acc_t.at[:, row].set(ct)
            return (acc_p, acc_t), None

        (acc_p, acc_t), _ = jax.lax.scan(
            row_body,
            (jnp.zeros((M, 12)), jnp.zeros((M, K, 18))),
            (edge_cid, pv, Bv, jnp.arange(K, dtype=jnp.int32)))
        gp = acc_p[:, :3]
        Hpp = acc_p[:, 3:].reshape(M, 3, 3)
        T = acc_t.reshape(M, K, 6, 3)

        Hpp_d = Hpp + (lam * jnp.einsum("mii->mi", Hpp) + 1e-8)[..., None] \
            * jnp.eye(3)
        Hpp_inv = _inv3x3(Hpp_d) * cmask[:, None, None].astype(jnp.float32)

        bp = -gp
        bc = -gc
        tp = jnp.einsum("makj,mjl->makl", T, Hpp_inv)        # (M, K, 6, 3)
        S_cross = jnp.einsum("manj,mblj->anbl", tp, T)
        dampC = lam * jnp.einsum("kii->ki", Hcc) + 1e-8
        S = (jnp.zeros((K, 6, K, 6))
             .at[jnp.arange(K), :, jnp.arange(K), :]
             .add(Hcc + jnp.einsum("ki,ij->kij", dampC, jnp.eye(6)))
             - S_cross)
        bc_red = bc - jnp.einsum("manj,mj->an", tp, bp)

        # seam priors: strong camera-camera terms from the measured loop
        # edges (see _loop_prior_terms) — fixed-camera factors masked so
        # the gauge rows stay untouched
        r0, Jk, Jc2 = _loop_prior_terms(st, q, t)
        wl = st.loop_w
        fk = camf[st.loop_j][:, None, None]
        fc = camf[st.loop_i][:, None, None]
        Jk = Jk * fk
        Jc2 = Jc2 * fc
        wJk = wl[:, None, None] * Jk
        wJc = wl[:, None, None] * Jc2
        li, lj = st.loop_i, st.loop_j
        S = (S
             .at[lj, :, lj, :].add(jnp.einsum("lij,lik->ljk", wJk, Jk))
             .at[li, :, li, :].add(jnp.einsum("lij,lik->ljk", wJc, Jc2))
             .at[lj, :, li, :].add(jnp.einsum("lij,lik->ljk", wJk, Jc2))
             .at[li, :, lj, :].add(jnp.einsum("lij,lik->ljk", wJc, Jk)))
        bc_red = (bc_red
                  .at[lj].add(-jnp.einsum("lij,li->lj", wJk, r0))
                  .at[li].add(-jnp.einsum("lij,li->lj", wJc, r0)))

        # pad fixed-camera rows with identity so the dense solve stays
        # nonsingular; their rhs is zeroed
        pad = ~st.cam_free
        Sm = S.reshape(6 * K, 6 * K)
        Sm = Sm + jnp.diag(jnp.repeat(pad, 6).astype(jnp.float32))
        bvec = (bc_red * camf[:, None]).reshape(-1)
        xc = jnp.nan_to_num(jnp.linalg.solve(Sm, bvec),
                            nan=0.0, posinf=0.0, neginf=0.0).reshape(K, 6)
        xc = xc * camf[:, None]

        tx = jnp.einsum("mknj,kn->mj", T, xc)
        xp = jnp.nan_to_num(jnp.einsum("mjk,mk->mj", Hpp_inv, bp - tx),
                            nan=0.0, posinf=0.0, neginf=0.0)

        dq, dt = se3.exp(xc)
        q_new, t_new = se3.compose(dq, dt, q, t)
        q_new = jnp.where(st.cam_free[:, None], q_new, q)
        t_new = jnp.where(st.cam_free[:, None], t_new, t)
        pos_new = pos + xp * cmask[:, None].astype(jnp.float32)

        e2, _, _, z2 = _dense_gba_terms(st, q_new, t_new, pos_new, cfg)
        _, err_new = _dense_gba_weights(st, e2, z2)
        err_new = err_new + _loop_prior_error(st, q_new, t_new)
        improved = err_new < err
        q = jnp.where(improved, q_new, q)
        t = jnp.where(improved, t_new, t)
        pos = jnp.where(improved, pos_new, pos)
        lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0),
                       1e-10, 1e8)
        err = jnp.where(improved, err_new, err)
        return q, t, pos, lam, err

    def body(_, carry):
        return lm_step(*carry)

    q, t, pos, lam, err = jax.lax.fori_loop(
        0, n_iters, body, (st.q, st.t, st.pos, st.lam, st.err))
    return st._replace(q=q, t=t, pos=pos, lam=lam, err=err)


# --------------------------------------------------------------------------
# Dense-Schur windowed BA: the local-mapping workhorse.
# --------------------------------------------------------------------------

def windowed_bundle_adjustment(kf_q, kf_t, window_rows, kf_uv, kf_ur,
                               kf_octave, kf_mp, kp_valid, mp_pos, mp_free,
                               cfg: SlamConfig, phases=(5, 10),
                               axis_name: str = None, n_row_shards: int = 1):
    """Local BA with an explicitly materialized reduced camera system.

    The matrix-free CG path (bundle_adjustment) evaluates ~4 edge-indexed
    gather/scatter passes per CG iteration; on TPU random access runs at
    ~0.125 elements/cycle, so at local-BA scale each LM iteration costs
    hundreds of ms. With only W free cameras (the local window,
    ``Optimizer.cc:517-590``), the Schur complement S is a dense
    (6W x 6W) matrix that can be built with ONE pass: camera-side terms are
    row-broadcasts over the (K, P) observation table (zero gathers), and
    the solve is a tiny dense system. Fixed cameras still constrain
    landmarks through the point-side normal equations.

    The landmark-side reductions (gp, Hpp, the camera-landmark cross
    blocks T) are NOT scatter-adds: TPU scatter retires ~1 index/cycle, so
    the ~30k-edge scatter into the 16k-point pool used to dominate the LM
    iteration (~16 ms measured). Instead the free landmarks are compacted
    to a dense axis of MW = cfg.solver.local_ba_max_points slots and the
    per-edge blocks are segment-summed by ONE-HOT MATMULS on the MXU, one
    (P x MW) one-hot per camera row inside a lax.scan — the same
    incidence-matmul idiom as map/state.covisibility. Free points beyond
    MW (never seen at local-window scale with default capacities) stay
    fixed for the step.

    kf_q (K, 4), kf_t (K, 3): ALL keyframe poses; window_rows (W,) int32
    rows that are free (-1 padding); kf_uv/kf_ur/kf_octave/kf_mp/kp_valid:
    (K, P) observation table; mp_pos (M, 3); mp_free (M,).

    With ``axis_name`` (inside a shard_map over ``n_row_shards`` row
    blocks), the (K, P) observation table and the per-row camera poses are
    DEVICE-LOCAL row blocks (window_rows hold GLOBAL compact-table
    indices): camera-system terms scatter into the (Wn, 6[,6]) window
    arrays and psum over ICI, the landmark accumulators psum once per LM
    iteration, and the tiny dense solve is replicated — the local-mapping
    analog of the distributed GBA (SURVEY.md §2.D row "distributed comm
    backend").

    Returns (kf_q, kf_t, mp_pos, edge_inlier (K, P) bool, n_free_total).
    """
    K, P = kf_mp.shape            # K = LOCAL row count under shard_map
    M = mp_pos.shape[0]
    Wn = window_rows.shape[0]
    sc = cfg.solver
    cam = cfg.camera
    MW = min(sc.local_ba_max_points, M)

    def _rsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    row_g = jnp.arange(K)
    if axis_name is not None and n_row_shards > 1:
        row_g = row_g + jax.lax.axis_index(axis_name) * K

    win_valid = window_rows >= 0
    # local window index per keyframe row (-1 = fixed); functional inverse
    # of window_rows (scatter-free: padded -1 slots must not collide)
    eq = (window_rows[None, :] == row_g[:, None]) & win_valid[None, :]
    loc = jnp.where(eq.any(axis=1),
                    jnp.argmax(eq, axis=1).astype(jnp.int32), -1)

    mp_idx = jnp.clip(kf_mp, 0)
    edge_valid0 = kp_valid & (kf_mp >= 0)
    row_free = (loc >= 0)[:, None]                              # (K, 1)
    obs = jnp.concatenate([kf_uv, kf_ur[..., None]], axis=-1)   # (K, P, 3)
    is_stereo = kf_ur > 0
    inv_sigma2 = cfg.orb.scale_factor ** (-2.0 * kf_octave.astype(jnp.float32))
    delta2 = jnp.where(is_stereo, sc.huber_stereo2, sc.huber_mono2)
    delta = jnp.sqrt(delta2)
    comp_w0 = jnp.stack([jnp.ones_like(kf_ur), jnp.ones_like(kf_ur),
                         is_stereo.astype(jnp.float32)], -1)     # (K, P, 3)

    # ---- compact free-landmark table: free pool row -> [0, MW) slot.
    # When the free set overflows MW, keep the NEWEST pool rows free (the
    # window's freshly spawned landmarks, which need refinement most) and
    # freeze the oldest — ranking ascending by pool id would instead freeze
    # exactly the new points whenever long-lived observations keep old
    # landmarks in the free set.
    rank_from_end = jnp.cumsum(
        mp_free[::-1].astype(jnp.int32))[::-1] - 1
    sel = mp_free & (rank_from_end < MW)
    slot_asc = jnp.cumsum(sel.astype(jnp.int32)) - 1
    in_compact = sel
    cid_of_mp = jnp.where(in_compact, slot_asc, MW)             # (M,)
    free_ids = jnp.zeros((MW + 1,), jnp.int32).at[cid_of_mp].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop")[:MW]       # slot -> row
    n_free = jnp.sum(in_compact.astype(jnp.int32))
    cmask = jnp.arange(MW) < n_free                             # filled slots
    edge_cid = cid_of_mp[mp_idx]                                # (K, P)
    edge_free = edge_cid < MW
    pw_fix = mp_pos[mp_idx]            # (K, P, 3) frozen non-free positions
    cpos0 = mp_pos[free_ids] * cmask[:, None].astype(mp_pos.dtype)

    def edge_terms(q, t, cpos):
        """Residuals/Jacobians over the (K, P) table; cameras broadcast per
        row (no gathers on the camera side); free-landmark positions come
        from the compact table, fixed ones from the frozen snapshot."""
        pw = jnp.where(edge_free[..., None],
                       cpos[jnp.clip(edge_cid, 0, MW - 1)], pw_fix)
        xc = se3.apply(q[:, None, :], t[:, None, :], pw)
        x, y = xc[..., 0], xc[..., 1]
        z = jnp.maximum(xc[..., 2], _EPS)
        iz = 1.0 / z
        iz2 = iz * iz
        u = cam.fx * x * iz + cam.cx
        v = cam.fy * y * iz + cam.cy
        ur = u - cam.bf * iz
        e = jnp.stack([u, v, ur], axis=-1) - obs
        du = jnp.stack([cam.fx * iz, jnp.zeros_like(z), -cam.fx * x * iz2], -1)
        dv = jnp.stack([jnp.zeros_like(z), cam.fy * iz, -cam.fy * y * iz2], -1)
        dur = du + jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z),
                              cam.bf * iz2], -1)
        dpred = jnp.stack([du, dv, dur], axis=-2)            # (K, P, 3, 3)
        zeros = jnp.zeros_like(z)
        nskew = jnp.stack([
            jnp.stack([zeros, xc[..., 2], -xc[..., 1]], -1),
            jnp.stack([-xc[..., 2], zeros, xc[..., 0]], -1),
            jnp.stack([xc[..., 1], -xc[..., 0], zeros], -1),
        ], axis=-2)
        eye = jnp.broadcast_to(jnp.eye(3), nskew.shape)
        dxc = jnp.concatenate([eye, nskew], axis=-1)         # (K, P, 3, 6)
        Jc = jnp.einsum("kpij,kpjn->kpin", dpred, dxc)
        R = se3.quat_to_matrix(q)                            # (K, 3, 3)
        Jp = jnp.einsum("kpij,kjn->kpin", dpred, R)
        return e, Jc, Jp, z

    def weights(e, z, edge_mask, use_kernel):
        e2 = jnp.sum(e * e * comp_w0, axis=-1)
        chi2 = e2 * inv_sigma2
        if use_kernel:
            w_rob = jnp.where(chi2 <= delta2, 1.0,
                              delta / jnp.maximum(jnp.sqrt(chi2), _EPS))
            rho = jnp.where(chi2 <= delta2, chi2,
                            2 * delta * jnp.sqrt(chi2) - delta2)
        else:
            w_rob = jnp.ones_like(chi2)
            rho = chi2
        ok = edge_mask & (z > _EPS)
        # edge_w: bounded-influence entry weight of fixed-row edges (set
        # once per BA call, below); cost and gradient stay consistent
        w = jnp.where(ok, inv_sigma2 * w_rob, 0.0) * edge_w
        return (w[..., None] * comp_w0,
                _rsum(jnp.sum(jnp.where(ok, rho * edge_w, 0.0))))

    def lm_step(q, t, cpos, edge_mask, use_kernel, lam, err):
        e, Jc, Jp, z = edge_terms(q, t, cpos)
        Wt, _ = weights(e, z, edge_mask, use_kernel)         # (K, P, 3)
        cam_on = (loc >= 0).astype(jnp.float32)[:, None, None]  # (K,1,1)
        Wc = Wt * cam_on                                     # cam-side weights

        # camera side: per-row reductions scattered into the window arrays
        # (loc is injective over window slots; psum'd when rows are sharded)
        We = Wt * e
        gc_k = jnp.einsum("kpin,kpi->kn", Jc, We * cam_on)   # (K, 6)
        Hcc_k = jnp.einsum("kpin,kpi,kpim->knm", Jc, Wc, Jc)  # (K, 6, 6)
        tgt_w = jnp.where(loc >= 0, loc, Wn)
        gc = _rsum(jnp.zeros((Wn, 6)).at[tgt_w].add(gc_k, mode="drop"))
        Hcc = _rsum(jnp.zeros((Wn, 6, 6)).at[tgt_w].add(Hcc_k, mode="drop"))

        # point side: one-hot segment sums on the MXU, one camera row per
        # scan step. Edges whose landmark is fixed/invalid have
        # edge_cid == MW and match NO one-hot column, so they vanish from
        # the landmark system without any masking pass; HIGHEST matmul
        # precision keeps the f32 Hessian blocks exact (the 0/1 left
        # operand is representable, the right operand must not be
        # truncated to bf16).
        pv = jnp.concatenate([
            jnp.einsum("kpin,kpi->kpn", Jp, We),
            jnp.einsum("kpin,kpi,kpim->kpnm", Jp, Wt, Jp).reshape(K, P, 9),
        ], -1)                                               # (K, P, 12)
        Bv = jnp.einsum("kpin,kpi,kpim->kpnm", Jc, Wc, Jp).reshape(K, P, 18)
        cid_masked = jnp.where(edge_mask, edge_cid, MW)

        def row_body(carry, xs):
            acc_p, acc_t = carry
            cid_r, pv_r, b_r, loc_r = xs
            oh = (cid_r[:, None] == jnp.arange(MW)[None, :]).astype(
                jnp.float32)                                 # (P, MW)
            acc_p = acc_p + jnp.matmul(
                oh.T, pv_r, precision=jax.lax.Precision.HIGHEST)
            ct = jnp.matmul(oh.T, b_r,
                            precision=jax.lax.Precision.HIGHEST)  # (MW, 18)
            acc_t = acc_t.at[:, jnp.clip(loc_r, 0)].add(
                jnp.where(loc_r >= 0, ct, 0.0))
            return (acc_p, acc_t), None

        (acc_p, acc_t), _ = jax.lax.scan(
            row_body,
            (jnp.zeros((MW, 12)), jnp.zeros((MW, Wn, 18))),
            (cid_masked, pv, Bv, loc))
        acc_p = _rsum(acc_p)
        acc_t = _rsum(acc_t)
        gp = acc_p[:, :3]                                    # (MW, 3)
        Hpp = acc_p[:, 3:].reshape(MW, 3, 3)
        T = acc_t.reshape(MW, Wn, 6, 3)

        # damped landmark inverses (unfilled slots excluded from Schur)
        Hpp_d = Hpp + (lam * jnp.einsum("mii->mi", Hpp) + 1e-8)[..., None] \
            * jnp.eye(3)
        Hpp_inv = _inv3x3(Hpp_d) * cmask[:, None, None].astype(jnp.float32)

        bp = -gp
        bc = -gc
        S_cross = jnp.einsum("manj,mjk,mblk->anbl", T, Hpp_inv, T)
        dampC = lam * jnp.einsum("wii->wi", Hcc) + 1e-8
        S = (jnp.zeros((Wn, 6, Wn, 6))
             .at[jnp.arange(Wn), :, jnp.arange(Wn), :]
             .add(Hcc + jnp.einsum("wi,ij->wij", dampC, jnp.eye(6)))
             - S_cross)
        bc_red = bc - jnp.einsum("manj,mjk,mk->an", T, Hpp_inv, bp)

        # pad unused window slots with identity rows. LU solve, not
        # Cholesky: the explicitly formed Schur complement can go slightly
        # indefinite under f32 cancellation (Hcc - T Hpp^-1 T^T with large
        # monocular-scale landmark terms); a NaN step is sanitized and then
        # rejected by the LM accept test, whose growing damping restores
        # definiteness on the retry. TPU's approximate TriangularSolve is
        # acceptable HERE (unlike inverse iteration, ops/linalg.min_eigvec):
        # the damped system is well-conditioned (measured 3e-7 relative
        # error at this size) and this solve runs on the per-chunk hot path
        # where an eigh-based solve costs ~70 ms extra per mapping step.
        pad = ~win_valid
        Sm = S.reshape(6 * Wn, 6 * Wn)
        diag_pad = jnp.repeat(pad, 6)
        Sm = Sm + jnp.diag(diag_pad.astype(jnp.float32))
        bvec = (bc_red * win_valid[:, None]).reshape(-1)
        xc = jnp.nan_to_num(jnp.linalg.solve(Sm, bvec),
                            nan=0.0, posinf=0.0, neginf=0.0).reshape(Wn, 6)
        xc = xc * win_valid[:, None]

        # back-substitute landmarks: xp = Hpp_inv (bp - T^T xc)
        tx = jnp.einsum("mwnj,wn->mj", T, xc)
        xp = jnp.nan_to_num(jnp.einsum("mjk,mk->mj", Hpp_inv, bp - tx),
                            nan=0.0, posinf=0.0, neginf=0.0)

        # candidate update: each local row composes its own window slot's
        # step (replicated xc), so no cross-row gather is needed — the same
        # math as the old window-row scatter, shard-local by construction
        dq, dt = se3.exp(xc)
        l0 = jnp.clip(loc, 0)
        qi_new, ti_new = se3.compose(dq[l0], dt[l0], q, t)
        sel = (loc >= 0)[:, None]
        q_new = jnp.where(sel, qi_new, q)
        t_new = jnp.where(sel, ti_new, t)
        cpos_new = cpos + xp * cmask[:, None].astype(jnp.float32)

        e2, _, _, z2 = edge_terms(q_new, t_new, cpos_new)
        _, err_new = weights(e2, z2, edge_mask, use_kernel)
        improved = err_new < err
        q = jnp.where(improved, q_new, q)
        t = jnp.where(improved, t_new, t)
        cpos = jnp.where(improved, cpos_new, cpos)
        lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0), 1e-10, 1e8)
        err_prev = err
        err = jnp.where(improved, err_new, err)
        # convergence exit (cf. pose_opt.lm_round): the loop is the mapping
        # step's dominant cost and typically converges well before the
        # reference's fixed 5+10 budget — a tiny camera step, a stalled
        # error, or blown-up damping all mean further iterations buy nothing
        done = ((jnp.sum(xc * xc) < 1e-8)
                | (improved & (err_prev - err_new < 1e-5 * err_prev))
                | (~improved & (lam > 1e4)))
        return q, t, cpos, lam, err, done

    def lm_phase(q, t, cpos, edge_mask, use_kernel, n_iters):
        e, _, _, z = edge_terms(q, t, cpos)
        _, err0 = weights(e, z, edge_mask, use_kernel)

        def cond(carry):
            i, _, _, _, _, _, done = carry
            return (i < n_iters) & ~done

        def body(carry):
            i, q, t, cpos, lam, err, _ = carry
            q, t, cpos, lam, err, done = lm_step(q, t, cpos, edge_mask,
                                                 use_kernel, lam, err)
            return i + 1, q, t, cpos, lam, err, done

        _, q, t, cpos, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), q, t, cpos, jnp.float32(1e-4), err0,
                         jnp.array(False)))
        return q, t, cpos

    q, t, cpos = kf_q, kf_t, cpos0
    # FIXED rows' edges enter the cost with a BOUNDED-INFLUENCE weight
    # from their ENTRY residual: their poses are not optimized this step,
    # so gross stale observations would otherwise drag the free window
    # every step (measured 2x drift), while cutting them outright removes
    # the gauge anchor whenever the entry state is far from converged
    # (e.g. right after a loop correction). Edges within 3 sigma keep
    # weight 1; beyond that the weight decays as 9*delta^2/chi2 — a
    # constant per step, unlike the (unbounded-influence) Huber inside the
    # iterations. The association itself is NOT pruned — callers keep
    # fixed-row entries for loop closing and the global BA.
    e0, _, _, _ = edge_terms(q, t, cpos)
    chi2_0 = jnp.sum(e0 * e0 * comp_w0, -1) * inv_sigma2
    edge_w = jnp.where(row_free | (chi2_0 <= 9.0 * delta2), 1.0,
                       (9.0 * delta2) / jnp.maximum(chi2_0, 1e-9))
    edge_mask = edge_valid0
    for i, n_iters in enumerate(phases):
        use_kernel = i == 0
        q, t, cpos = lm_phase(q, t, cpos, edge_mask, use_kernel, n_iters)
        e, _, _, z = edge_terms(q, t, cpos)
        chi2 = jnp.sum(e * e * comp_w0, -1) * inv_sigma2
        edge_mask = edge_valid0 & (chi2 <= delta2) & (z > _EPS)
    # a LOOSE (3-sigma) variant of the final gate, returned for callers
    # that want to prune fixed-row edges less aggressively than the strict
    # gate. Currently UNUSED by the shipped pipeline: local_mapping prunes
    # every participating row at the strict gate (loose retention was
    # measured worse end-to-end — see the edge-pruning note in
    # pipeline/local_mapping.py); kept in the return tuple as the
    # measured-and-rejected alternative plus API stability for external
    # callers (parallel/dist_ba passes it through).
    edge_loose = edge_valid0 & (chi2 <= 9.0 * delta2) & (z > _EPS)
    # write the optimized free landmarks back into the full pool (one
    # MW-row scatter per BA call, not per iteration)
    pos = mp_pos.at[jnp.where(cmask, free_ids, M)].set(cpos, mode="drop")
    # the TOTAL free-landmark count is returned so callers can OBSERVE
    # compact-axis overflow (count > MW means landmarks ranked past the cap
    # were silently frozen this step); the compact table keeps the NEWEST
    # rows when it overflows
    return q, t, pos, edge_mask, edge_loose, \
        jnp.sum(mp_free.astype(jnp.int32))
