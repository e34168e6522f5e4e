"""Distributed bundle adjustment over a device mesh.

The TPU-native replacement for the reference's (non-existent) multi-node
story (SURVEY.md §2.D, §5.8): BA edges are sharded over the ``mp`` mesh
axis with ``shard_map``; camera/point states stay replicated; every
edge-indexed reduction inside the Schur-LM solver psums over ICI
(solvers/ba.py ``axis_name``). Results are bit-identical to the
single-device solve (same reduction tree up to float addition order), which
the test suite asserts on the virtual CPU mesh (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.solvers import ba


def pad_problem(prob: ba.BAProblem, n_shards: int) -> ba.BAProblem:
    """Pad the edge axis to a multiple of the shard count (padding edges
    are invalid and contribute zeros)."""
    E = prob.cam_idx.shape[0]
    pad = (-E) % n_shards
    if pad == 0:
        return prob
    return ba.BAProblem(
        cam_idx=jnp.pad(prob.cam_idx, (0, pad)),
        mp_idx=jnp.pad(prob.mp_idx, (0, pad)),
        obs=jnp.pad(prob.obs, ((0, pad), (0, 0))),
        is_stereo=jnp.pad(prob.is_stereo, (0, pad)),
        inv_sigma2=jnp.pad(prob.inv_sigma2, (0, pad)),
        valid=jnp.pad(prob.valid, (0, pad)))


def distributed_gba_chunk(mesh, st: ba.GBAState, cfg: SlamConfig,
                          n_iters: int, cg_iters: int = 100) -> ba.GBAState:
    """One background-GBA chunk with DEVICE-LOCAL map state: the point pool
    (``pos``/``mp_free``) and the edge set are sharded over the ``mp`` mesh
    axis; only the small camera system (6K floats) is replicated. The
    pipeline-integrated distributed path (LoopCloser(mesh=...) routes its
    chunks here). Per-edge point gathers ride an all_gather of the (M, 3)
    position table over ICI and point-side reductions come home via
    psum_scatter, so both HBM footprint and edge FLOPs scale with the mesh
    (SURVEY.md §2.D; the same Schur-LM sequence as the single-device chunk,
    results ε-match up to float addition order).

    The state's problem must already be padded to a multiple of the shard
    count (pad_problem at gba_start time); the point pool capacity
    (cfg.map.max_mps) must divide evenly by the shard count."""
    axis = cfg.mesh.mp_axis
    n_shards = mesh.shape[axis]
    rep = P()
    edge = P(axis)
    pt = P(axis)          # point pool rows: device-local blocks
    spec = ba.GBAState(
        q=rep, t=rep, pos=pt, lam=rep, err=rep,
        prob=ba.BAProblem(cam_idx=edge, mp_idx=edge, obs=edge,
                          is_stereo=edge, inv_sigma2=edge, valid=edge),
        cam_free=rep, mp_free=pt, n0=rep, nm0=rep)

    def step(s):
        return ba.gba_chunk(s, cfg, n_iters=n_iters, cg_iters=cg_iters,
                            robust=False, axis_name=axis,
                            shard_points=True, n_shards=n_shards)

    fn = jax.shard_map(step, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_vma=False)
    return fn(st)


def distributed_bundle_adjustment(mesh, q, t, cam_free, pos, mp_free,
                                  prob: ba.BAProblem, cfg: SlamConfig,
                                  phases=(5, 10), cg_iters: int = 20):
    """Edge-parallel Schur-LM BA: one program, N shards, psum reductions.

    mesh: a jax.sharding.Mesh with an axis named by cfg.mesh.mp_axis.
    Returns (q, t, pos, edge_inlier) with the edge mask in the PADDED
    layout (use prob.valid to re-trim).
    """
    axis = cfg.mesh.mp_axis
    n_shards = mesh.shape[axis]
    prob = pad_problem(prob, n_shards)

    rep = P()
    edge = P(axis)
    in_specs = (rep, rep, rep, rep, rep,
                ba.BAProblem(cam_idx=edge, mp_idx=edge, obs=edge,
                             is_stereo=edge, inv_sigma2=edge, valid=edge))
    out_specs = (rep, rep, rep, edge)

    def step(q, t, cam_free, pos, mp_free, prob):
        return ba.bundle_adjustment(q, t, cam_free, pos, mp_free, prob,
                                    cfg, phases=phases, cg_iters=cg_iters,
                                    axis_name=axis)

    fn = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(q, t, cam_free, pos, mp_free, prob)


def distributed_windowed_ba(mesh, kf_q, kf_t, window_rows, kf_uv, kf_ur,
                            kf_octave, kf_mp, kp_valid, mp_pos, mp_free,
                            cfg: SlamConfig, phases=(5, 10)):
    """Windowed local BA with the compact observation table ROW-SHARDED
    over the ``kf`` mesh axis — the local-mapping collective phase
    (SURVEY.md §2.D, §7.1 step 9): each shard evaluates its rows'
    residuals/Jacobians and one-hot landmark matmuls; the (Wn, 6)-sized
    camera system and the compact landmark accumulators psum over ICI; the
    tiny dense solve is replicated. ε-matches the single-device solve.

    The row count (2*window compact rows) must divide evenly by the kf-axis
    size. Returns (kf_q, kf_t, mp_pos, edge_inlier, edge_loose, n_free)
    like ba.windowed_bundle_adjustment.
    """
    axis = cfg.mesh.kf_axis
    n_row_shards = mesh.shape[axis]
    rep = P()
    row = P(axis)
    in_specs = (row, row, rep, row, row, row, row, row, rep, rep)
    out_specs = (row, row, rep, row, row, rep)

    def step(q, t, wrows, uv, ur, octv, mp, kpv, pos, mpf):
        return ba.windowed_bundle_adjustment(
            q, t, wrows, uv, ur, octv, mp, kpv, pos, mpf, cfg,
            phases=phases, axis_name=axis, n_row_shards=n_row_shards)

    fn = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(kf_q, kf_t, window_rows, kf_uv, kf_ur, kf_octave, kf_mp,
              kp_valid, mp_pos, mp_free)
