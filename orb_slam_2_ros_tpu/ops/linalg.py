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

import jax
import jax.numpy as jnp


def min_eigvec(G: jnp.ndarray, v0: jnp.ndarray = None, iters: int = 4,
               eps_scale: float = 1e-4) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric PSD G, polished
    by inverse iteration on (G + eps I).

    eps must exceed f32 roundoff in G (whose true smallest eigenvalue may
    round slightly negative) so the Cholesky stays PD; inverse iteration
    converges to the smallest eigen-direction for any eps well below the
    next eigenvalue (gain ~ lambda_2 / eps per step).
    """
    d = G.shape[-1]
    if v0 is None:
        _, evecs = jnp.linalg.eigh(G)
        v0 = evecs[..., :, 0]
    eps = eps_scale * jnp.trace(G) / d
    cf = jax.scipy.linalg.cho_factor(G + eps * jnp.eye(d))
    v = v0
    for _ in range(iters):
        v = jax.scipy.linalg.cho_solve(cf, v)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-20)
    return v


def null_vector(A: jnp.ndarray, iters: int = 4) -> jnp.ndarray:
    """Most-null right-singular vector of A (rows x d), f32-TPU-safe."""
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    # minimal (rows < d) systems return Vt (rows, d): start from the last row
    return min_eigvec(A.T @ A, v0=Vt[-1], iters=iters)
