"""Distributed BA on the virtual 8-device CPU mesh: the sharded solve must
epsilon-match the single-device Schur solve (SURVEY.md §4 multi-host test
strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.parallel import dist_ba
from orb_slam_2_ros_tpu.parallel.mesh import make_mesh
from orb_slam_2_ros_tpu.solvers import ba

from test_ba import make_ba_problem, mean_pose_err


def test_distributed_matches_single_device():
    (cfg, prob, q0, t0, pos0, cam_free, q_true, t_true, pts) = \
        make_ba_problem(n_cams=6, n_pts=120)
    mp_free = jnp.ones(pos0.shape[0], bool)

    q1, t1, pos1, inl1 = ba.bundle_adjustment(
        q0, t0, cam_free, pos0, mp_free, prob, cfg)

    mesh = make_mesh(n_kf=1, n_mp=8, devices=jax.devices("cpu")[:8])
    q2, t2, pos2, inl2 = dist_ba.distributed_bundle_adjustment(
        mesh, q0, t0, cam_free, pos0, mp_free, prob, cfg)

    # converged solutions agree to float tolerance (addition order differs)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=2e-3)
    assert abs(mean_pose_err(q2, t2, q_true, t_true)
               - mean_pose_err(q1, t1, q_true, t_true)) < 1e-3
    # edge inlier masks agree after trimming the shard padding
    E = prob.valid.shape[0]
    np.testing.assert_array_equal(np.asarray(inl2)[:E][np.asarray(prob.valid)],
                                  np.asarray(inl1)[np.asarray(prob.valid)])


def test_distributed_converges():
    (cfg, prob, q0, t0, pos0, cam_free, q_true, t_true, pts) = \
        make_ba_problem(n_cams=6, n_pts=120)
    mesh = make_mesh(n_kf=1, n_mp=8, devices=jax.devices("cpu")[:8])
    q2, t2, pos2, _ = dist_ba.distributed_bundle_adjustment(
        mesh, q0, t0, cam_free, pos0, jnp.ones(pos0.shape[0], bool),
        prob, cfg)
    assert mean_pose_err(q2, t2, q_true, t_true) < 6e-3
