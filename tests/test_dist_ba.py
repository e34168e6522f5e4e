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


def test_loop_gba_distributed_matches_single_device():
    """The pipeline-integrated distributed path: a LoopCloser given a mesh
    runs its background-GBA chunks through dist_ba.distributed_gba_chunk;
    closing the same drifted ring with and without the mesh must produce
    epsilon-matching maps (same Schur-LM sequence, psum'd reductions)."""
    from orb_slam_2_ros_tpu.pipeline.loop_closing import LoopCloser
    from orb_slam_2_ros_tpu.place import vocabulary
    from test_loop_closing import build_looped_map, small_cfg

    cfg = small_cfg()
    m0, gt, descs = build_looped_map(cfg)
    voc = vocabulary.train_vocabulary(descs, cfg, seed=0)
    mesh = make_mesh(n_kf=1, n_mp=8, devices=jax.devices("cpu")[:8])

    results = []
    for mesh_arg in (None, mesh):
        lc = LoopCloser(cfg, voc, min_kfs_between_loops=6,
                        background_gba=True, mesh=mesh_arg)
        m = m0
        for _ in range(8):
            # defer=False: consume the detection verdict synchronously so
            # the loop can break as soon as the closure lands (the async
            # default drains verdicts a beat later; tested elsewhere)
            m, did = lc.process(m, defer=False)
            if did:
                break
        assert lc.gba_running
        m = lc.run_gba_to_completion(m)
        results.append(m)
    m1, m2 = results
    # the LM accept test compares a psum'd error sum, so float addition
    # order can flip an accept/reject decision and the two paths take
    # slightly different (both valid) LM trajectories on this
    # ill-conditioned no-kernel problem — epsilon here is mm-level
    # agreement plus both matching ground truth like the sync test
    np.testing.assert_allclose(np.asarray(m2.kf_q), np.asarray(m1.kf_q),
                               atol=5e-3)
    # calibrated to the two-phase OptimizeSim3: the no-kernel GBA's LM
    # accept decisions diverge a little earlier between addition orders
    # from the slightly different measured seam (max dt 0.026 observed)
    np.testing.assert_allclose(np.asarray(m2.kf_t), np.asarray(m1.kf_t),
                               atol=4e-2)
    from test_loop_closing import N_KF, pose_err_deg_m
    for m in (m1, m2):
        errs = np.asarray([pose_err_deg_m(m.kf_q[i], m.kf_t[i], *gt[i])[1]
                           for i in range(N_KF)])
        assert np.isfinite(errs).all()
        assert float(np.max(errs)) < 0.09, errs


def test_distributed_converges():
    (cfg, prob, q0, t0, pos0, cam_free, q_true, t_true, pts) = \
        make_ba_problem(n_cams=6, n_pts=120)
    mesh = make_mesh(n_kf=1, n_mp=8, devices=jax.devices("cpu")[:8])
    q2, t2, pos2, _ = dist_ba.distributed_bundle_adjustment(
        mesh, q0, t0, cam_free, pos0, jnp.ones(pos0.shape[0], bool),
        prob, cfg)
    assert mean_pose_err(q2, t2, q_true, t_true) < 6e-3


def test_distributed_windowed_ba_matches_single_device():
    """The row-sharded windowed local BA (compact table over the kf axis,
    camera/landmark reductions psum'd) must ε-match the single-device
    dense-Schur solve."""
    from test_ba import _problem_as_table
    (cfg, prob, q0, t0, pos0, cam_free, q_true, t_true, pts) = \
        make_ba_problem(n_cams=8, n_pts=150)
    kf_uv, kf_ur, kf_oct, kf_mp, kp_valid = _problem_as_table(
        8, 150, prob, cfg)
    window_rows = jnp.asarray([1, 2, 3, 4, 5, 6, 7, -1], jnp.int32)
    mp_free = jnp.ones(pos0.shape[0], bool)

    q1, t1, pos1, inl1, _, nf1 = ba.windowed_bundle_adjustment(
        q0, t0, window_rows, kf_uv, kf_ur, kf_oct, kf_mp, kp_valid,
        pos0, mp_free, cfg)

    mesh = make_mesh(n_kf=4, n_mp=2, devices=jax.devices("cpu")[:8])
    q2, t2, pos2, inl2, _, nf2 = dist_ba.distributed_windowed_ba(
        mesh, q0, t0, window_rows, kf_uv, kf_ur, kf_oct, kf_mp, kp_valid,
        pos0, mp_free, cfg)

    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=2e-3)
    assert int(nf2) == int(nf1)
    assert abs(mean_pose_err(q2, t2, q_true, t_true)
               - mean_pose_err(q1, t1, q_true, t_true)) < 1e-3
    agree = (np.asarray(inl2) == np.asarray(inl1)).mean()
    assert agree > 0.99, agree


def test_multihost_single_process_noop():
    """parallel/multihost.py on a single host: initialize() is a no-op,
    global_mesh spans all local devices, session sharding is identity."""
    from orb_slam_2_ros_tpu.parallel import multihost
    assert multihost.initialize() == 0
    mesh = multihost.global_mesh(n_kf=1)
    assert mesh.devices.size == len(jax.devices())
    assert set(mesh.shape.keys()) == {"kf", "mp"}
    items = list(range(10))
    assert multihost.local_session_shard(items) == items
