"""Sim(3) pose-graph (essential graph) optimization for loop closing.

Replaces ``Optimizer::OptimizeEssentialGraph`` (SURVEY.md §2.11,
``Optimizer.cc:902-1165``): the reference builds a g2o problem with one
``VertexSim3Expmap`` per keyframe and ``EdgeSim3`` constraints from the loop
edge, spanning tree, covisibility (weight >= 100) and past loop edges, then
runs 20 LM iterations with lambda_init 1e-16 (``:1075,1108``).

Here the whole graph is batched: all edge residuals ``r = log(S_meas *
S_j * S_i^-1)`` and their 7x7 Jacobians (forward-mode, vmapped over edges)
are computed in one pass, scattered into the dense (7K x 7K) normal
equations, and solved by Cholesky — at the reference's operating scale
(hundreds of keyframes) the dense system is a few MB and one MXU-friendly
factorization, far cheaper than sparse bookkeeping.

Conventions: vertex i stores S_i = world->keyframe_i Sim3 (q wxyz, t, s).
Edge (i, j) measures S_ji = S_j * S_i^-1 (j expressed relative to i);
residual r_e = log(S_ji_meas * S_i * S_j^-1) — zero when consistent.
Left-multiplicative local updates: S <- exp(d) * S.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import sim3
from orb_slam_2_ros_tpu.ops.linalg import f32_matmul


def edge_residual(qi, ti, si, qj, tj, sj, rq, rt, rs):
    """r = log(S_ji_meas * (S_j * S_i^-1)^-1), (7,) — zero when the current
    vertices reproduce the measured relative transform."""
    q_ji, t_ji, s_ji = sim3.compose(qj, tj, sj, *sim3.inverse(qi, ti, si))
    qe, te, se = sim3.compose(rq, rt, rs, *sim3.inverse(q_ji, t_ji, s_ji))
    return sim3.log(qe, te, se)


def _residual_local(d_i, d_j, qi, ti, si, qj, tj, sj, rq, rt, rs):
    """Residual after left-multiplicative perturbations exp(d) * S."""
    qi2, ti2, si2 = sim3.compose(*sim3.exp(d_i), qi, ti, si)
    qj2, tj2, sj2 = sim3.compose(*sim3.exp(d_j), qj, tj, sj)
    return edge_residual(qi2, ti2, si2, qj2, tj2, sj2, rq, rt, rs)


@f32_matmul
def optimize_essential_graph(q, t, s, edges_i, edges_j, rel_q, rel_t, rel_s,
                             edge_w, fixed, cfg: SlamConfig,
                             iters: int = None):
    """Batched GN/LM over the Sim3 pose graph.

    q (K,4), t (K,3), s (K,1): current world->KF Sim3 per vertex.
    edges_*: (E,) endpoint indices; rel_*: measured S_ji per edge;
    edge_w: (E,) weights (0 disables an edge — static-shape masking);
    fixed: (K,) bool — vertices held constant (the loop keyframe,
    ``Optimizer.cc:957``).

    Returns (q, t, s) optimized. 20 iterations with tiny initial damping
    mirror the reference's schedule (``Optimizer.cc:1075,1108``).
    """
    K = q.shape[0]
    n_it = cfg.solver.essential_iters if iters is None else iters

    jac = jax.vmap(jax.jacfwd(_residual_local, argnums=(0, 1)),
                   in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    res_fn = jax.vmap(edge_residual)
    z7 = jnp.zeros((7,))

    free = ~fixed

    def build_normal(qc, tc, sc):
        qi, ti, si = qc[edges_i], tc[edges_i], sc[edges_i]
        qj, tj, sj = qc[edges_j], tc[edges_j], sc[edges_j]
        r = res_fn(qi, ti, si, qj, tj, sj, rel_q, rel_t, rel_s)     # (E, 7)
        Ji, Jj = jac(z7, z7, qi, ti, si, qj, tj, sj,
                     rel_q, rel_t, rel_s)                            # (E,7,7)
        w = edge_w[:, None, None]
        # gauge: zero out columns of fixed vertices
        Ji = Ji * w * free[edges_i][:, None, None]
        Jj = Jj * w * free[edges_j][:, None, None]
        rw = r * edge_w[:, None]

        # assemble H (K,7,K,7) via block scatter-add
        H = jnp.zeros((K, 7, K, 7))
        HiTi = jnp.einsum("eab,eac->ebc", Ji, Ji)
        HjTj = jnp.einsum("eab,eac->ebc", Jj, Jj)
        HiTj = jnp.einsum("eab,eac->ebc", Ji, Jj)
        H = H.at[edges_i, :, edges_i, :].add(HiTi)
        H = H.at[edges_j, :, edges_j, :].add(HjTj)
        H = H.at[edges_i, :, edges_j, :].add(HiTj)
        H = H.at[edges_j, :, edges_i, :].add(jnp.swapaxes(HiTj, 1, 2))
        b = jnp.zeros((K, 7))
        b = b.at[edges_i].add(jnp.einsum("eab,ea->eb", Ji, rw))
        b = b.at[edges_j].add(jnp.einsum("eab,ea->eb", Jj, rw))
        chi2 = jnp.sum(rw * r)
        return H.reshape(7 * K, 7 * K), b.reshape(7 * K), chi2

    def step(carry, _):
        qc, tc, sc, lam = carry
        H, b, chi2 = build_normal(qc, tc, sc)
        # fixed + unconstrained rows get identity so Cholesky stays PD
        diag_fix = jnp.repeat(fixed, 7)
        no_constraint = jnp.diag(H) <= 0
        pad = diag_fix | no_constraint
        H = H + jnp.diag(jnp.where(pad, 1.0, lam * jnp.maximum(jnp.diag(H),
                                                               1e-12)))
        # eigh-based SPD solve: TPU's Cholesky triangular solves are
        # approximate blocked inversions; eigh is accurate on-device and the
        # (7K x 7K) system is tiny for the MXU
        w_e, V_e = jnp.linalg.eigh(H)
        d = -(V_e @ ((V_e.T @ b) / jnp.maximum(w_e, 1e-8)))
        d = d.reshape(K, 7) * free[:, None]
        dq, dt, ds = sim3.exp(d)
        q2, t2, s2 = sim3.compose(dq, dt, ds, qc, tc, sc)
        # accept if chi2 decreased (cheap LM: evaluate new chi2 next round;
        # here we always accept with tiny lambda like the reference's
        # essential graph, whose 1e-16 lambda is effectively Gauss-Newton)
        return (q2, t2, s2, lam), chi2

    (q2, t2, s2, _), chi2s = jax.lax.scan(
        step, (q, t, s, jnp.asarray(1e-8)), None, length=n_it)
    return q2, t2, s2, chi2s


def correct_points(mp_pos, owner_kf, q_old, t_old, s_old, q_new, t_new, s_new,
                   mp_mask):
    """Re-express map points through their owner keyframe's corrected pose:
    ``p' = S_new_i^-1 ( S_old_i (p) )`` (``LoopClosing::CorrectLoop`` point
    propagation, ``LoopClosing.cc:567-588``).

    owner_kf: (M,) keyframe id owning each point (its reference keyframe);
    *_old/_new: (K, ...) Sim3 pools; mp_mask: (M,) apply-mask.
    """
    qo = q_old[owner_kf]
    to = t_old[owner_kf]
    so = s_old[owner_kf]
    qn, tn, sn = sim3.inverse(q_new[owner_kf], t_new[owner_kf],
                              s_new[owner_kf])
    cam = sim3.apply(qo, to, so, mp_pos)
    fixed_pos = sim3.apply(qn, tn, sn, cam)
    return jnp.where(mp_mask[:, None], fixed_pos, mp_pos)
