"""Small-matrix numerical helpers tuned for float32 TPU execution.

TPU's on-device f32 SVD/eigh resolve trailing (smallest) eigenvectors poorly
when the spectrum's tail clusters — measured to cost ~25% of epipolar inliers
in the initializer's refit and ~0.01 rad of EPnP pose error on noiseless
data. A few inverse-iteration steps on the regularized Gram/system matrix
(Cholesky solves are exact in f32 at these sizes) recover full accuracy on
both CPU and TPU. Used by the H/F initializer (SURVEY.md §2.8), EPnP
(§2.9), and any other small null-space problem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def f32_matmul(fn):
    """Trace ``fn`` under float32 matmul precision.

    TPU matmuls default to bf16 operand precision; its 8-bit mantissa wipes
    out the near-null-space signal of the small Gram/DLT systems the
    closed-form solvers build (measured: EPnP minimal-set translation error
    6 cm with default precision vs micrometres with f32 — the null vector
    lives ~1e-12 below the dominant eigenvalue, far beneath bf16 roundoff).
    These systems are tiny (<= 12x12), so full-f32 MXU passes cost nothing.
    """
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped


@f32_matmul
def min_eigvec(G: jnp.ndarray, v0: jnp.ndarray = None, iters: int = 4,
               eps_scale: float = 1e-4) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric PSD G, polished
    by inverse iteration on (G + eps I).

    eps must exceed f32 roundoff in G (whose true smallest eigenvalue may
    round slightly negative) so the Cholesky stays PD; inverse iteration
    converges to the smallest eigen-direction for any eps well below the
    next eigenvalue (gain ~ lambda_2 / eps per step).

    The solves use the UNROLLED Cholesky (solve_spd_unrolled), never XLA's
    TriangularSolve: on TPU the latter is a blocked approximate inversion
    whose f32 error exceeds the eigh error this polish is meant to remove
    (measured: cho_solve residual ~46 on a 12x12 system where the unrolled
    solve is exact to roundoff).
    """
    d = G.shape[-1]
    if v0 is None:
        _, evecs = jnp.linalg.eigh(G)
        v0 = evecs[..., :, 0]
    eps = eps_scale * jnp.trace(G) / d
    H = G + eps * jnp.eye(d)
    v = v0
    for _ in range(iters):
        v = solve_spd_unrolled(H, v)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-20)
    return v


def _orthonormalize(V: jnp.ndarray) -> jnp.ndarray:
    """Modified Gram-Schmidt over the columns of V (d, k) — unrolled at
    trace time; avoids QR, whose TPU lowering goes through the inaccurate
    TriangularSolve (see min_eigvec)."""
    k = V.shape[-1]
    cols = []
    for i in range(k):
        v = V[:, i]
        for u in cols:
            v = v - jnp.dot(u, v) * u
        cols.append(v / jnp.maximum(jnp.linalg.norm(v), 1e-20))
    return jnp.stack(cols, axis=-1)


@f32_matmul
def min_subspace(G: jnp.ndarray, k: int, iters: int = 4,
                 eps_scale: float = 1e-4) -> jnp.ndarray:
    """(d, k) orthonormal basis of the k smallest eigendirections of
    symmetric PSD G, f32-TPU-safe: seed from eigh, polish by block inverse
    iteration on (G + eps I) with unrolled-Cholesky solves + Gram-Schmidt,
    order by Rayleigh-Ritz (TPU's f32 eigh resolves clustered trailing
    eigenvectors poorly, and its TriangularSolve is approximate — see
    min_eigvec)."""
    d = G.shape[-1]
    _, evecs = jnp.linalg.eigh(G)
    V = evecs[:, :k]
    eps = eps_scale * jnp.trace(G) / d
    H = G + eps * jnp.eye(d)
    for _ in range(iters):
        V = jax.vmap(lambda b: solve_spd_unrolled(H, b),
                     in_axes=-1, out_axes=-1)(V)
        V = _orthonormalize(V)
    w, U = jnp.linalg.eigh(V.T @ G @ V)     # Rayleigh-Ritz ordering
    return V @ U


def solve_spd_unrolled(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for small SPD H (n <= ~8) with a fully unrolled
    Cholesky factorization + triangular solves.

    ``jnp.linalg.solve`` lowers to pivoted LU whose sequential control flow
    costs tens of microseconds per call on TPU — ruinous inside the pose LM
    loop (g2o's dense 6x6 solve equivalent, ``Optimizer.cc:272``). Unrolling
    at trace time turns the factorization into ~n^3/3 fused scalar ops with
    no loops, which XLA schedules in nanoseconds-per-element vector code.
    """
    n = H.shape[-1]
    eps = jnp.asarray(1e-12, H.dtype)
    # Cholesky: L (lower) with H = L L^T, row-major unrolled
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = H[..., i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, eps))
        inv_d = 1.0 / L[i][i]
        for j in range(i + 1, n):
            s = H[..., j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv_d
    # forward solve L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back solve L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


@f32_matmul
def null_vector(A: jnp.ndarray, iters: int = 4) -> jnp.ndarray:
    """Most-null right-singular vector of A (rows x d), f32-TPU-safe."""
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    # minimal (rows < d) systems return Vt (rows, d): start from the last row
    return min_eigvec(A.T @ A, v0=Vt[-1], iters=iters)
