"""Distributed pose optimization: edges sharded over the mesh, normal
equations reduced with psum — the small instance of the distributed-BA
pattern (SURVEY.md §2.D: local Schur elimination per shard + collective
reduction of the camera system over ICI).

The pose is replicated; each shard of observation edges contributes a partial
6x6 H and 6-vector b via `shard_map`, reduced with `jax.lax.psum` over the
``mp`` axis. The LM loop then runs replicated on every device (identical
results, zero extra comm). Numerics match the single-device solver up to
floating-point reduction order (asserted in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.geometry import se3
from orb_slam_2_ros_tpu.solvers import pose_opt as po

_EPS = 1e-9


def distributed_pose_optimization(mesh: Mesh, q0, t0, pts, obs_uv, obs_ur,
                                  octave, valid, cfg: SlamConfig):
    """Same contract as solvers.pose_opt.pose_optimization, but edge arrays
    are sharded over the mesh's ``mp`` axis. Returns (q, t, inlier, n_inliers)
    with inlier sharded like the inputs."""
    sc = cfg.solver
    n_dev = mesh.shape["mp"]

    espec = P("mp")
    rspec = P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(rspec, rspec, espec, espec, espec, espec, espec),
        out_specs=(rspec, rspec, espec, rspec),
    )
    def _run(q0, t0, pts, obs_uv, obs_ur, octave, valid):
        is_stereo = obs_ur > 0
        inv_sigma2 = cfg.orb.scale_factor ** (-2.0 * octave.astype(jnp.float32))
        obs = jnp.concatenate([obs_uv, obs_ur[:, None]], axis=-1)
        delta2 = jnp.where(is_stereo, sc.huber_stereo2, sc.huber_mono2)
        delta = jnp.sqrt(delta2)

        def system(q, t, edge_mask, use_kernel):
            e, J, z = po._residual_jacobian(q, t, pts, obs, cfg)
            comp_w = jnp.stack([jnp.ones_like(obs_ur), jnp.ones_like(obs_ur),
                                is_stereo.astype(jnp.float32)], axis=-1)
            chi2 = po._edge_chi2(e, is_stereo, inv_sigma2)
            if use_kernel:
                w_rob = jnp.where(chi2 <= delta2, 1.0,
                                  delta / jnp.maximum(jnp.sqrt(chi2), _EPS))
                rho = jnp.where(chi2 <= delta2, chi2,
                                2.0 * delta * jnp.sqrt(chi2) - delta2)
            else:
                w_rob = jnp.ones_like(chi2)
                rho = chi2
            w = jnp.where(edge_mask & (z > _EPS), inv_sigma2 * w_rob, 0.0)
            Wc = comp_w * w[:, None]
            # partial normal equations on this shard ...
            H = jnp.einsum("mik,mi,mij->kj", J, Wc, J)
            b = jnp.einsum("mik,mi->k", J, e * Wc)
            err = jnp.sum(jnp.where(edge_mask & (z > _EPS), rho, 0.0))
            # ... reduced over the mp axis on ICI
            H = jax.lax.psum(H, "mp")
            b = jax.lax.psum(b, "mp")
            err = jax.lax.psum(err, "mp")
            return H, b, err

        def lm_round(q, t, edge_mask, use_kernel, n_iters):
            _, _, err0 = system(q, t, edge_mask, use_kernel)

            def body(_, carry):
                q, t, lam, err = carry
                H, b, _ = system(q, t, edge_mask, use_kernel)
                Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
                xi = -jnp.linalg.solve(Hd, b)
                dq, dt = se3.exp(xi)
                q_new, t_new = se3.compose(dq, dt, q, t)
                _, _, err_new = system(q_new, t_new, edge_mask, use_kernel)
                improved = err_new < err
                q = jnp.where(improved, q_new, q)
                t = jnp.where(improved, t_new, t)
                lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0),
                               1e-9, 1e6)
                err = jnp.where(improved, err_new, err)
                return q, t, lam, err

            q, t, _, _ = jax.lax.fori_loop(0, n_iters, body, (q, t, 1e-4, err0))
            return q, t

        q, t = q0, t0
        inlier = valid
        for rnd in range(sc.pose_rounds):
            use_kernel = rnd < sc.pose_rounds - 1
            q, t = lm_round(q, t, inlier, use_kernel, sc.pose_iters)
            e, _, z = po._residual_jacobian(q, t, pts, obs, cfg)
            chi2 = po._edge_chi2(e, is_stereo, inv_sigma2)
            inlier = valid & (chi2 <= delta2) & (z > _EPS)
        n_in = jax.lax.psum(jnp.sum(inlier.astype(jnp.int32)), "mp")
        return q, t, inlier, n_in

    # place inputs
    ded = NamedSharding(mesh, espec)
    rep = NamedSharding(mesh, rspec)
    args = (jax.device_put(q0, rep), jax.device_put(t0, rep),
            jax.device_put(pts, ded), jax.device_put(obs_uv, ded),
            jax.device_put(obs_ur, ded), jax.device_put(octave, ded),
            jax.device_put(valid, ded))
    return jax.jit(_run)(*args)
