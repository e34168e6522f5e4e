"""End-to-end smoke on the checked-in miniature TUM dataset: the full
dataset->System->trajectory pipeline of the reference's RGBD node
(``RGBDNode.cc`` + ``System::TrackRGBD`` + ``SaveTrajectoryTUM``,
``System.cc:343-401``), runnable with zero egress — the runbook proxy for
fr1/desk (BASELINE.md)."""

import os

import numpy as np

from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_RGBD
from orb_slam_2_ros_tpu.io.datasets import TumRGBD
from orb_slam_2_ros_tpu.io.trajectory import ate_rmse
from orb_slam_2_ros_tpu.pipeline.slam import System
from orb_slam_2_ros_tpu.pipeline.tracking import OK

ROOT = os.path.join(os.path.dirname(__file__), "data", "mini_tum")


def test_tum_mini_end_to_end(tmp_path):
    ds = TumRGBD(ROOT)
    cfg = SlamConfig(sensor=SENSOR_RGBD)
    sys_ = System(cfg, enable_loop_closing=False)
    n = len(ds)
    grays = np.stack([ds[i][0] for i in range(n)])
    depths = np.stack([ds[i][1] for i in range(n)])
    recs = sys_.track_chunk(grays, depths, ds.timestamps)
    recs += sys_.flush()
    n_ok = sum(r.state == OK for r in sys_.records)
    assert n_ok >= n - 2, n_ok

    # composed trajectory against groundtruth.txt (TUM evaluation protocol)
    out = str(tmp_path / "traj.txt")
    sys_.save_trajectory_tum(out)
    est = np.loadtxt(out)
    gt = np.loadtxt(os.path.join(ROOT, "groundtruth.txt"))
    ts_to_gt = {round(t, 4): i for i, t in enumerate(gt[:, 0])}
    idx = [ts_to_gt[round(t, 4)] for t in est[:, 0]]
    ate = ate_rmse(est[:, 1:4], gt[idx, 1:4])
    assert np.isfinite(ate)
    assert ate < 0.05, ate
