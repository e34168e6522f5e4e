"""KITTI devkit relative-error metric (io/trajectory.kitti_relative_error):
known synthetic drifts must come back exactly."""

import numpy as np

from orb_slam_2_ros_tpu.io.trajectory import kitti_relative_error


def _straight_line(n, step=2.0):
    """GT: identity orientation, +z at `step` m/frame."""
    return [(np.eye(3), np.array([0.0, 0.0, step * i])) for i in range(n)]


def test_translation_scale_drift():
    gt = _straight_line(600)
    est = [(R, 1.02 * c) for R, c in gt]   # 2% scale error
    t_rel, r_rel, n = kitti_relative_error(est, gt)
    assert n > 0
    assert abs(t_rel - 0.02) < 1e-6
    assert r_rel < 1e-9


def test_rotation_drift_per_metre():
    gt = _straight_line(600)
    omega = 1e-4   # rad per metre of travel
    est = []
    for R, c in gt:
        th = omega * c[2]
        cy, sy = np.cos(th), np.sin(th)
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        est.append((Ry, c))
    t_rel, r_rel, n = kitti_relative_error(est, gt)
    assert n > 0
    assert abs(r_rel - omega) < 1e-8
    # deg/100m conversion sanity: 1e-4 rad/m = 0.573 deg/100m
    assert abs(r_rel * 100 * 180 / np.pi - 0.573) < 1e-3


def test_perfect_trajectory_zero_error():
    gt = _straight_line(600)
    t_rel, r_rel, n = kitti_relative_error(gt, gt)
    assert n > 0 and t_rel == 0.0 and r_rel == 0.0


def test_too_short_returns_nan():
    gt = _straight_line(10)   # 18 m total < 100 m
    t_rel, r_rel, n = kitti_relative_error(gt, gt)
    assert n == 0 and np.isnan(t_rel)
